"""FaceApp quick start: the one-object front-end over a named pack.

The reference wires FaceDetector + FaceRecognizer by hand in every mode
(reference src/main.cpp:264-316); FaceApp packages that wiring once:

  python examples/quickstart_faceapp.py [--pack buffalo_sc]
      [--model-dir models/] [--image a.jpg --image2 b.jpg] [--cpu]

With no images, synthetic frames demonstrate the API shape. With a
models/ directory holding the pack's .onnx files (the reference layout,
models/README.md:28-30), the real weights load; otherwise
deterministic-init native weights (same contract as the CLI).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pack", default="buffalo_sc")
    ap.add_argument("--model-dir", default="models")
    ap.add_argument("--image", default=None)
    ap.add_argument("--image2", default=None)
    ap.add_argument("--quant", default=None, choices=[None, "w8a8", "w8a8-fast"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from facerecognizeonnx_tpu import FaceApp

    app = FaceApp.from_pack(args.pack, model_dir=args.model_dir,
                            quant=args.quant)
    print(f"pack={args.pack}: det_{app.detector.cfg.scrfd_variant} + "
          f"{app.recognizer.cfg.rec_arch}")

    if args.image:
        from facerecognizeonnx_tpu.io.imageio import imread

        img1 = imread(args.image)
        img2 = imread(args.image2) if args.image2 else img1
    else:
        rng = np.random.default_rng(0)
        img1 = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        img2 = np.roll(img1, 40, axis=1)

    faces = app.get(img1)
    print(f"faces: {len(faces)}")
    for i, f in enumerate(faces[:4]):
        x, y, w, h = f.box.box
        print(f"  face {i}: box=({x},{y},{w},{h}) score={f.score:.3f} "
              f"emb[:3]={np.round(f.embedding[:3], 4)}")

    same, sim = app.verify(img1, img2)
    print(f"verify: sim={sim:.4f} -> {'同一人' if same else '不同人'} (阈值 0.6)")


if __name__ == "__main__":
    main()
