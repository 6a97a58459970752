"""Tests for the serving front-end and the PSNR evaluation tool."""

import io
import json
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

CFG = {
    "n1": 4, "n2": 2, "f1": 3, "f2": 1, "f3": 3,
    "momentum": 0.9, "weight_decay_parameter": 0.0,
    "learning_rates": [0.01, 0.01, 0.001],
    **{
        f"parameters_distribution_{i}": {
            "mean_w": 0.0, "mean_b": 0.0,
            "std_deviation_w": 0.05, "std_deviation_b": 0.0,
        }
        for i in (1, 2, 3)
    },
}


@pytest.fixture
def cfg_path(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(CFG))
    return str(p)


def test_serve_upscale_roundtrip(cfg_path):
    import serve
    from http.server import ThreadingHTTPServer

    from cnn_sr_tpu.training.trainer import init_train_state
    from cnn_sr_tpu.utils.config import read_config

    cfg = read_config(cfg_path)
    state = init_train_state(cfg, seed=0)
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), serve.build_handler(cfg, state.params, False, 1.0)
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok\n"

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/upscale", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = np.asarray(Image.open(io.BytesIO(r.read())))
        assert out.shape == (20, 24, 3)
        np.testing.assert_array_equal(out[0, 0], img[0, 0])  # border passthrough

        # garbage body → clean 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/upscale", data=b"not an image", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
    finally:
        server.shutdown()


def test_evaluate_tool(cfg_path, tmp_path, capsys):
    import evaluate

    rng = np.random.default_rng(1)
    d = tmp_path / "samples"
    os.makedirs(str(d))
    for i in range(3):
        large = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        small = ((large.astype(np.float32) + np.roll(large, 1, 0)) / 2).astype(np.uint8)
        Image.fromarray(large, "RGB").save(str(d / f"s{i}_large.png"))
        Image.fromarray(small, "RGB").save(str(d / f"s{i}_small.png"))

    rc = evaluate.main(["-c", cfg_path, "-i", str(d), "--seed", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MEAN" in out and "bicubic" in out
