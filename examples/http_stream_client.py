"""Streaming HTTP client demo: enroll, then pipeline a frame stream.

Run the service first (on the TPU host):
  python -m facerecognizeonnx_tpu serve --port 8080 --auth-token demo

Then from anywhere:
  python examples/http_stream_client.py --port 8080 --token demo \
      [--frames 32] [--image face.jpg]

With no --image, synthetic JPEG frames are generated. Results stream
back one NDJSON line per frame while later frames are still uploading
(pipeline/client.IdentifyClient.identify_stream — full duplex over one
socket; every frame rides the server's shared device micro-batches).
"""

import argparse
import io
import time


def synthetic_jpegs(n):
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (480, 640, 3), np.uint8)
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray(np.roll(base, 13 * i, axis=1)).save(
            buf, "JPEG", quality=90
        )
        yield buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--token", default=None)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--image", default=None, help="enroll + stream this file")
    args = ap.parse_args()

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from facerecognizeonnx_tpu.pipeline.client import IdentifyClient

    client = IdentifyClient(args.host, args.port, token=args.token,
                            timeout=900)
    print("health:", client.healthz())

    if args.image:
        data = open(args.image, "rb").read()
        print("enroll:", client.enroll("demo", data))
        frames = (data for _ in range(args.frames))
    else:
        frames = synthetic_jpegs(args.frames)

    t0 = time.perf_counter()
    n_faces = 0
    for line in client.identify_stream(frames, top_k=1):
        faces = line.get("faces", [])
        n_faces += len(faces)
        tag = faces[0]["names"][:1] if faces else line.get("error", "-")
        print(f"frame {line['frame']}: {len(faces)} faces {tag}")
    dt = time.perf_counter() - t0
    print(f"{args.frames} frames in {dt:.2f}s "
          f"({args.frames / dt:.1f} fps, {n_faces} faces) — "
          f"stats: {client.stats()}")


if __name__ == "__main__":
    main()
