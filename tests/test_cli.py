"""CLI mode tests (headless, stdout contract per reference README.md:133-169)."""

import numpy as np
import pytest

from facerecognizeonnx_tpu.cli.main import main


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(9)
    paths = []
    for name in ("one.jpg", "two.jpg"):
        p = str(d / name)
        cv2.imwrite(p, rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))
        paths.append(p)
    return paths


def test_usage_error_on_missing_args(capsys):
    rc = main(["compare"])
    assert rc == -1
    assert "无效的命令或参数" in capsys.readouterr().out


def test_simple_mode(jpegs, capsys):
    rc = main(["simple", jpegs[0], jpegs[1]])
    out = capsys.readouterr().out
    assert rc == 0
    assert "特征维度: 512" in out
    assert "相似度:" in out
    assert ("同一人" in out) or ("不同人" in out)


def test_compare_mode(jpegs, capsys):
    rc = main(["compare", jpegs[0], jpegs[1]])
    out = capsys.readouterr().out
    assert rc == 0
    # random-weight detector saturates → faces exist → full compare path
    assert "图像1检测到" in out
    assert "特征维度: 512" in out
    assert ("同一人" in out) or ("不同人" in out)


def test_detect_mode_writes_output(jpegs, capsys):
    import os

    rc = main(["detect", jpegs[0]])
    out = capsys.readouterr().out
    assert rc == 0
    assert "检测到" in out
    assert os.path.exists(jpegs[0].replace(".jpg", "_out.jpg"))


def test_webcam_synthetic_headless(capsys):
    rc = main(["webcam", "synthetic:320x240x3", "--enroll-first"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "frames=3" in out


def test_enroll_and_identify(jpegs, tmp_path, capsys):
    gallery = str(tmp_path / "g.npz")
    rc = main(["enroll", jpegs[0], jpegs[1], "--gallery", gallery])
    out = capsys.readouterr().out
    assert rc == 0
    assert "已注册" in out
    rc = main(["identify", jpegs[0], "--gallery", gallery])
    out = capsys.readouterr().out
    assert rc == 0
    assert "人脸 1:" in out


def test_export_mode_writes_onnx(tmp_path, capsys):
    out = str(tmp_path / "exported_r18.onnx")
    rc = main(["export", out, "--rec-arch", "iresnet18"])
    assert rc == 0
    assert "已导出 ONNX 模型" in capsys.readouterr().out
    import os

    assert os.path.getsize(out) > 1_000_000
    # the exported file loads back through the importer's native mapper
    from facerecognizeonnx_tpu.onnx_import.native_map import map_recognizer

    assert map_recognizer(out, "iresnet18") is not None


def test_export_mode_writes_frtz_bundle(tmp_path, capsys):
    """`export out.frtz` produces a loadable+runnable AOT bundle."""
    out = str(tmp_path / "pipeline.frtz")
    rc = main([
        "export", out, "--rec-arch", "iresnet18", "--det-size", "128",
        "--batch", "1",
    ])
    assert rc == 0
    assert "已导出 AOT 程序包" in capsys.readouterr().out

    import numpy as np

    from facerecognizeonnx_tpu.pipeline.aot import load_bundle

    pipe = load_bundle(out)
    assert pipe.batch == 1
    frames = np.zeros((1, 128, 128, 3), np.uint8)
    outs = pipe(frames)
    assert np.asarray(outs[4]).shape[-1] == 512


def test_simple_mode_quantized(jpegs, capsys):
    rc = main(["simple", jpegs[0], jpegs[1], "--rec-arch", "mbf",
               "--quant", "w8a8-fast"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Recognizer quantized to w8a8 int8" in out
    assert "特征维度: 512" in out


def test_quant_calib_flag(jpegs, capsys):
    """--quant-calib detects+aligns the given images and calibrates the
    int8 scales on those crops (random-weight detector fires on noise,
    so crops exist)."""
    rc = main([
        "simple", jpegs[0], jpegs[1],
        "--rec-arch", "iresnet18",
        "--quant", "w8a8-fast", "--quant-calib", jpegs[0], jpegs[1],
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "int8 校准" in out
    assert "quantized" in out
    assert "相似度:" in out


def test_serve_sigterm_persists_gallery(jpegs, tmp_path):
    """CLI serve: SIGTERM (the deployment kill signal) drains the server
    and persists the gallery — requires a real process (signal handlers
    live in the main thread), so this drives the module entry point."""
    import os
    import signal
    import subprocess
    import sys
    import time
    import urllib.request

    gallery = str(tmp_path / "g.npz")
    # --cpu, not only the env var: the axon plugin's sitecustomize stomps
    # JAX_PLATFORMS at interpreter startup, so without the in-process
    # jax.config flip the child would try to init the tunneled TPU
    # backend — and hang the test whenever that backend is unavailable
    # (observed 2026-08-18: axon outage turned this into the suite's
    # only failure). Same bootstrap as __graft_entry__.dryrun_multichip.
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    proc = subprocess.Popen(
        [sys.executable, "-m", "facerecognizeonnx_tpu", "serve", "--cpu",
         "--rec-arch", "iresnet18", "--gallery", gallery, "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        import re

        port = None
        deadline = time.time() + 300
        for line in proc.stdout:
            m = re.search(r"http://[0-9.]+:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
            assert time.time() < deadline, "server never came up"
        assert port, "startup line not seen"

        with open(jpegs[0], "rb") as f:
            img = f.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/enroll?name=alice", data=img,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=420) as r:
            import json

            body = json.loads(r.read())
        assert body["enrolled"] is True, body

        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=180)
        assert os.path.exists(gallery), "SIGTERM did not persist the gallery"

        from facerecognizeonnx_tpu.match.gallery import GalleryBank

        bank = GalleryBank.load(gallery)
        assert len(bank) == 1 and "alice" in bank.names
    finally:
        if proc.poll() is None:
            proc.kill()


def test_webcam_tracked_headless(capsys):
    """--track routes the webcam loop through the IOU tracker +
    embedding cache (pipeline/track.py) and reports the embed fraction."""
    rc = main(["webcam", "synthetic:320x240x6", "--track", "--enroll-first",
               "--rec-arch", "iresnet18"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "embed_fraction=" in out
    assert "frames=6" in out


def test_train_mode(tmp_path, capsys):
    """CLI train: identity folders → .npz weights that load back through
    the standard --rec-model path (framework extension; the reference
    ships pre-trained weights only, models/README.md:15-19)."""
    import cv2

    root = tmp_path / "ids"
    rng = np.random.default_rng(5)
    for ident in range(2):
        d = root / f"person_{ident}"
        d.mkdir(parents=True)
        base = np.kron(
            np.random.default_rng(100 + ident).uniform(0, 255, (28, 28, 3)),
            np.ones((4, 4, 1)),
        )
        for s in range(3):
            img = np.clip(base + rng.normal(0, 10, base.shape), 0, 255)
            cv2.imwrite(str(d / f"{s}.jpg"), img.astype(np.uint8))

    out = str(tmp_path / "trained.npz")
    rc = main(["train", str(root), "--steps", "2", "--batch", "4",
               "--rec-arch", "iresnet18", "--lr", "0.01", "--out", out])
    stdout = capsys.readouterr().out
    assert rc == 0
    assert "训练完成" in stdout and "2 步" in stdout
    import os

    assert os.path.exists(out)

    # the trained weights drive the reference `simple` mode end-to-end
    img = str(tmp_path / "probe.jpg")
    cv2.imwrite(img, rng.integers(0, 256, (140, 140, 3), dtype=np.uint8))
    rc = main(["simple", img, img, "--rec-model", out,
               "--rec-arch", "iresnet18"])
    stdout = capsys.readouterr().out
    assert rc == 0
    assert "特征维度: 512" in stdout


def test_detect_mode_bulk(jpegs, capsys):
    """Multiple inputs route through the native-loader bulk path
    (FaceDetector.detect_files) with a per-file + total summary."""
    rc = main(["detect", jpegs[0], jpegs[1]])
    out = capsys.readouterr().out
    assert rc == 0
    assert "one.jpg: 检测到" in out
    assert "two.jpg: 检测到" in out
    assert "共 2 张图像" in out


def test_eval_mode(tmp_path, capsys):
    """CLI eval: identity folders → LFW-protocol verification report
    with k-fold accuracy, selected threshold, and TAR@FAR (framework
    extension; the reference's only quality signal is the 0.6 compare
    verdict, src/main.cpp:118-123)."""
    import json

    import cv2

    root = tmp_path / "ids"
    rng = np.random.default_rng(11)
    for ident in range(3):
        d = root / f"person_{ident}"
        d.mkdir(parents=True)
        base = np.kron(
            np.random.default_rng(200 + ident).uniform(0, 255, (28, 28, 3)),
            np.ones((4, 4, 1)),
        )
        for s in range(3):
            img = np.clip(base + rng.normal(0, 8, base.shape), 0, 255)
            cv2.imwrite(str(d / f"{s}.jpg"), img.astype(np.uint8))

    rc = main(["eval", str(root), "--rec-arch", "iresnet18",
               "--pairs", "16", "--folds", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "准确率:" in out and "TAR@FAR" in out
    report = json.loads(out.strip().splitlines()[-1])
    assert report["identities"] == 3 and report["images"] == 9
    assert 0.0 <= report["accuracy"] <= 1.0
    assert 0.0 <= report["best_threshold"] <= 1.0
    assert report["genuine_pairs"] == 8 and report["impostor_pairs"] == 8
    # random-weight iresnet18 still separates these pixel-block
    # identities: same-id crops differ only by small noise, so genuine
    # similarity must exceed impostor on average
    assert report["accuracy"] >= 0.5


def test_eval_mode_pairs_file(tmp_path, capsys):
    """Standard LFW pairs.txt protocol: 3-token genuine / 4-token
    impostor lines over root/Name/Name_%04d.jpg, file order = folds;
    header lines and pairs with missing images are skipped."""
    import json

    import cv2

    root = tmp_path / "lfw"
    rng = np.random.default_rng(21)
    for ident in ("Alice_One", "Bob_Two"):
        d = root / ident
        d.mkdir(parents=True)
        base = np.kron(
            np.random.default_rng(hash(ident) % 1000).uniform(0, 255, (28, 28, 3)),
            np.ones((4, 4, 1)),
        )
        for s in (1, 2, 3):
            img = np.clip(base + rng.normal(0, 8, base.shape), 0, 255)
            cv2.imwrite(str(d / f"{ident}_{s:04d}.jpg"), img.astype(np.uint8))

    pairs = tmp_path / "pairs.txt"
    pairs.write_text(
        "2\t3\n"  # header: skipped
        "Alice_One\t1\t2\n"
        "Alice_One\t1\t3\n"
        "Bob_Two\t1\t2\n"
        "Alice_One\t1\tBob_Two\t1\n"
        "Alice_One\t2\tBob_Two\t2\n"
        "Bob_Two\t3\tAlice_One\t3\n"
        "Alice_One\t1\tBob_Two\t9\n"  # missing image: dropped with a notice
    )
    rc = main(["eval", str(root), "--rec-arch", "iresnet18",
               "--pairs-file", str(pairs), "--folds", "3"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "跳过 1 对" in out
    report = json.loads(out.strip().splitlines()[-1])
    assert report["genuine_pairs"] == 3 and report["impostor_pairs"] == 3
    assert report["images"] == 6
    assert report["pairs_file"] == str(pairs)
    assert 0.0 <= report["accuracy"] <= 1.0 and "tar_at_far_0.01" in report


def test_pack_flag(jpegs, capsys):
    """--pack resolves a named buffalo pack to det-variant + rec-arch
    (models/packs.py) and reports the resolution; missing .onnx files
    fall back to deterministic-init native weights."""
    rc = main(["simple", jpegs[0], jpegs[1], "--pack", "buffalo_s"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "模型包 buffalo_s: det_500m + mbf" in out
    assert "特征维度: 512" in out


def test_eval_mode_detection_ap(jpegs, tmp_path, capsys):
    """eval --det-gt: detection AP against a ground-truth JSON via the
    batched detect path. GT = the detector's own positive-area
    detections, so every GT box has an identical (IoU=1) detection and
    recall must be exactly 1.0. (Random weights also emit degenerate
    negative-width boxes — those become unmatchable FPs, which is why
    the assertion is on recall, not AP; the AP math has its own oracle
    in test_eval.py.)"""
    import json
    import os

    from facerecognizeonnx_tpu.pipeline.api import FaceDetector

    det = FaceDetector()
    det.load_model()
    gt = {}
    for p in jpegs:
        import cv2

        faces = det.detect(cv2.imread(p))
        gt[os.path.basename(p)] = [
            [f.box[0], f.box[1], f.box[0] + f.box[2], f.box[1] + f.box[3]]
            for f in faces
            if f.box[2] > 0 and f.box[3] > 0
        ]
    assert any(gt.values()), "no positive-area detections to use as GT"
    gt_path = tmp_path / "gt.json"
    gt_path.write_text(json.dumps(gt))

    rc = main(["eval", os.path.dirname(jpegs[0]), "--det-gt", str(gt_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "检测评测" in out and "AP@0.50" in out
    report = json.loads(out.strip().splitlines()[-1])
    assert report["recall"] == pytest.approx(1.0)
    assert 0.0 < report["ap"] <= 1.0
    assert report["n_det"] >= report["n_gt"] > 0


def test_json_mode_compare(jpegs, capsys):
    import json

    rc = main(["compare", jpegs[0], jpegs[1], "--json"])
    captured = capsys.readouterr()
    out = captured.out
    assert rc == 0
    assert "相似度" in captured.err  # human narration went to stderr
    doc = json.loads(out)  # stdout is EXACTLY one JSON document
    assert doc["mode"] == "compare"
    assert 0.0 <= doc["similarity"] <= 1.0
    assert doc["threshold"] == 0.6
    assert doc["same"] == (doc["similarity"] > 0.6)
    assert len(doc["faces"]) == 2
    assert len(doc["faces"][0]["landmarks"]) == 5


def test_json_mode_detect(jpegs, capsys):
    import json

    rc = main(["detect", jpegs[0], "--json"])
    doc = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert doc["mode"] == "detect"
    assert doc["images"][0]["path"] == jpegs[0]
    assert doc["total_faces"] == sum(
        len(im["faces"]) for im in doc["images"]
    )
    for f in doc["images"][0]["faces"]:
        assert len(f["box"]) == 4 and isinstance(f["score"], float)


def test_json_mode_identify_and_enroll(jpegs, tmp_path, capsys):
    import json

    g = str(tmp_path / "g.npz")
    rc = main(["enroll", jpegs[0], "--gallery", g, "--json"])
    doc = json.loads(capsys.readouterr().out)
    assert rc == 0 and doc["mode"] == "enroll"
    assert doc["gallery_size"] >= 1

    rc = main(["identify", jpegs[1], "--gallery", g, "--json"])
    doc = json.loads(capsys.readouterr().out)
    assert rc == 0 and doc["mode"] == "identify"
    assert doc["gallery_size"] >= 1
    for face in doc["faces"]:
        assert "label" in face and face["matches"]
        for m in face["matches"]:
            assert 0.0 <= m["similarity"] <= 1.0


def test_doctor_mode(capsys):
    import json

    rc = main(["doctor", "--json"])
    doc = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert doc["mode"] == "doctor"
    assert doc["backend"]["device_count"] >= 1
    assert set(doc["packs"]) == {
        "buffalo_sc", "buffalo_s", "buffalo_m", "buffalo_l"
    }
    assert isinstance(doc["native_runtime"]["available"], bool)
    # the auto-arming real-file parity gate reports its state either way
    assert doc["real_model_parity"]["status"] in ("skipped", "ok")


def test_doctor_runs_real_model_parity_when_armed(tmp_path, capsys,
                                                  monkeypatch):
    """Drop stand-in files under the real names and point the env var at
    them: doctor must RUN the parity proof, not just check presence
    (VERDICT r3 item 3 — kills the 'someone must remember' failure).
    Stand-ins are full export-shaped graphs at the real 640/112 sizes so
    the default-config parity path is exactly what a real file takes."""
    import json

    import jax

    from facerecognizeonnx_tpu.models import arcface, scrfd
    from facerecognizeonnx_tpu.onnx_export import (
        export_detector,
        export_recognizer,
    )

    det_p = scrfd.init_params(jax.random.PRNGKey(0))
    export_detector(jax.device_get(det_p), str(tmp_path / "det_500m.onnx"))
    rec_p = arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    export_recognizer(jax.device_get(rec_p), str(tmp_path / "w600k_r50.onnx"))
    monkeypatch.setenv("FRT_REAL_MODELS_DIR", str(tmp_path))

    rc = main(["doctor", "--json", "--rec-arch", "iresnet18"])
    doc = json.loads(capsys.readouterr().out)
    assert rc == 0
    rmp = doc["real_model_parity"]
    assert rmp["status"] == "ok", rmp
    assert rmp["dir"] == str(tmp_path)
    assert rmp["recognizer"]["exec_cosine"] > 1 - 1e-3
    assert rmp["detector"]["input_size"] == 640


def test_doctor_mode_human(capsys):
    rc = main(["doctor"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "JAX backend" in out
    assert "pack buffalo_sc" in out


def test_identify_multi_probe(jpegs, tmp_path, capsys):
    import json

    g = str(tmp_path / "gmulti.npz")
    rc = main(["enroll", jpegs[0], "--gallery", g])
    capsys.readouterr()
    assert rc == 0
    rc = main(["identify", jpegs[0], jpegs[1], "--gallery", g, "--json"])
    doc = json.loads(capsys.readouterr().out)
    assert rc == 0 and doc["mode"] == "identify"
    assert [im["path"] for im in doc["images"]] == [jpegs[0], jpegs[1]]
    # multi-probe: every face carries a label + top-k matches
    for im in doc["images"]:
        for face in im["faces"]:
            assert "label" in face and face["matches"]


def test_train_detector_mode(tmp_path, capsys):
    """CLI `train --detector`: images + eval-format GT JSON → .npz that
    loads back through --det-model (BN folded on load) and drives
    detect. The learning proof itself is tests/test_detector_train.py;
    this covers the CLI plumbing end-to-end at a small det size."""
    import json
    import os

    import cv2

    root = tmp_path / "det_data"
    root.mkdir()
    rng = np.random.default_rng(11)
    size, r = 160, 16.0
    gt = {}
    for i in range(6):
        cx, cy = rng.uniform(40, size - 40, 2)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (r / 2) ** 2)))
        img = np.clip(20 + 30 * rng.random((size, size)) + 215 * blob, 0, 255)
        img = img[..., None].repeat(3, axis=-1).astype(np.uint8)
        cv2.imwrite(str(root / f"b{i}.png"), img)
        gt[f"b{i}.png"] = [[cx - r, cy - r, cx + r, cy + r]]
    gt_path = str(tmp_path / "gt.json")
    with open(gt_path, "w") as f:
        json.dump(gt, f)

    out = str(tmp_path / "det_tuned.npz")
    rc = main([
        "train", str(root), "--detector", "--det-gt", gt_path,
        "--det-size", "128", "--steps", "25", "--batch", "6",
        "--lr", "0.002", "--out", out,
    ])
    stdout = capsys.readouterr().out
    assert rc == 0
    assert "检测器训练" in stdout and "训练完成" in stdout
    assert os.path.exists(out)

    # weights load through the public detector path (BN folded on load)
    from facerecognizeonnx_tpu.config import auto_config
    from facerecognizeonnx_tpu.pipeline.api import FaceDetector

    det = FaceDetector(auto_config(det_input_size=128, compute_dtype="float32"))
    assert det.load_model(out) is True
    capsys.readouterr()
    probe = np.clip(
        20 + 30 * rng.random((128, 128)), 0, 255
    )[..., None].repeat(3, axis=-1).astype(np.uint8)
    det.detect(probe)  # runs the full fused program with tuned weights


def test_json_mode_with_pack_banner_on_stderr(capsys):
    """--pack's banner must not corrupt the --json stdout contract."""
    import json

    rc = main(["doctor", "--json", "--pack", "buffalo_s"])
    cap = capsys.readouterr()
    assert rc == 0
    doc = json.loads(cap.out)  # stdout parses as EXACTLY one JSON doc
    assert doc["mode"] == "doctor"
    assert "模型包 buffalo_s" in cap.err


def test_identify_empty_gallery_diagnostic(jpegs, tmp_path, capsys):
    """Empty gallery → clear diagnostic, not an IndexError."""
    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    g = str(tmp_path / "empty.npz")
    GalleryBank().save(g)
    rc = main(["identify", jpegs[0], "--gallery", g])
    out = capsys.readouterr().out
    assert rc == -1
    assert "gallery 为空" in out


def test_det_size_must_be_multiple_of_32(jpegs, capsys):
    rc = main(["detect", jpegs[0], "--det-size", "100"])
    out = capsys.readouterr().out
    assert rc == -1
    assert "32 的倍数" in out


def test_train_detector_rejects_zero_steps(tmp_path, capsys):
    import json

    gt = str(tmp_path / "gt.json")
    with open(gt, "w") as f:
        json.dump({}, f)
    rc = main(["train", str(tmp_path), "--detector", "--det-gt", gt,
               "--steps", "0"])
    out = capsys.readouterr().out
    assert rc == -1
    assert "--steps" in out


def test_train_detector_rejects_onnx_weights(tmp_path, capsys):
    """.onnx detector graphs are inference-only in the executor; the
    fine-tune path must say so instead of KeyError-ing in scrfd.apply."""
    import json

    import cv2

    onnx_path = str(tmp_path / "det.onnx")
    rc = main(["export", onnx_path, "--detector", "--det-size", "128"])
    capsys.readouterr()
    assert rc == 0

    cv2.imwrite(str(tmp_path / "a.png"),
                np.zeros((64, 64, 3), np.uint8))
    gt = str(tmp_path / "gt.json")
    with open(gt, "w") as f:
        json.dump({"a.png": [[10, 10, 30, 30]]}, f)
    rc = main(["train", str(tmp_path), "--detector", "--det-gt", gt,
               "--det-size", "128", "--steps", "1",
               "--det-model", onnx_path])
    out = capsys.readouterr().out
    assert rc == -1
    assert "训练形式" in out


def test_doctor_gallery_inspection(tmp_path, capsys):
    """doctor reports gallery stats + cross-name duplicates when the
    --gallery file exists."""
    import json

    import numpy as np

    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    rng = np.random.default_rng(5)
    feats = rng.normal(size=(6, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    feats[5] = feats[0]  # exact duplicate under a different name
    bank = GalleryBank()
    bank.add_batch([f"u{i}" for i in range(6)], feats)
    gpath = str(tmp_path / "g.npz")
    bank.save(gpath)

    rc = main(["doctor", "--json", "--gallery", gpath])
    doc = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert doc["gallery"]["rows"] == 6
    assert doc["gallery"]["identities"] == 6
    dups = doc["gallery"]["cross_name_duplicates"]
    assert {"a": "u0", "b": "u5", "sim": 1.0} in [
        {**d, "sim": round(d["sim"])} for d in dups
    ]
