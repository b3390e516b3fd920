"""The stdlib web demo (serve/web.py) — actually served and driven.

Unlike serve/app.py (gradio, absent from this image), this demo can
execute here: these tests bind it on an ephemeral port and drive the full
widget protocol over HTTP — examples gallery, the two-click ROI state
machine (app.ipynb:860-884 semantics via serve/ui.py), and a real edit on
the tiny pipeline returning a generated image + mask.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffute_tpu.config import tiny_test_config
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition
from diffute_tpu.pipeline import DiffUTEPipeline
from diffute_tpu.serve.ui import POINT_LABEL, ROI_LABEL
from diffute_tpu.serve.web import DemoBackend, make_server


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    cfg = tiny_test_config()
    vae = AutoencoderKL(cfg.vae)
    unet = UNet2DCondition(cfg.unet)
    trocr = TrOCREncoder(cfg.trocr)
    res = cfg.edit.resolution
    lat = res // cfg.vae.scale_factor
    params = {
        "vae": vae.init(jax.random.PRNGKey(0), jnp.zeros((1, res, res, 3)),
                        jax.random.PRNGKey(1))["params"],
        "unet": unet.init(
            jax.random.PRNGKey(2), jnp.zeros((1, lat, lat, 9)), jnp.array(0),
            jnp.zeros((1, cfg.trocr.seq_len, cfg.trocr.hidden_size)))["params"],
        "trocr": trocr.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, cfg.trocr.image_size,
                                       cfg.trocr.image_size, 3)))["params"],
    }
    pipe = DiffUTEPipeline(cfg, params)
    backend = DemoBackend(
        pipe, examples_dir=str(tmp_path_factory.mktemp("examples")))
    server = make_server(backend, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _decode_b64_png(data_url):
    b64 = data_url.split(",", 1)[-1]
    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))


def test_index_page_serves(server_url):
    status, ctype, body = _get(server_url + "/")
    assert status == 200 and "text/html" in ctype
    page = body.decode()
    # the reference demo's affordances are all present in the page
    assert "DiffUTE" in page
    assert 'min="20" max="200"' in page and 'value="150"' in page
    for widget in ("x0", "y0", "x1", "y1", "sampler", "examples"):
        assert f'id="{widget}"' in page


def test_examples_gallery(server_url):
    status, _, body = _get(server_url + "/api/examples")
    assert status == 200
    j = json.loads(body)
    assert j["samplers"] == ["ddim", "ddpm", "dpmpp"]
    assert len(j["examples"]) == 4
    row = j["examples"][0]
    assert set(row) == {"text", "image", "steps", "box"}
    # gallery images are fetchable PNGs
    status, ctype, png = _get(server_url + row["image"])
    assert status == 200 and ctype == "image/png"
    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.ndim == 3 and img.shape[2] == 3


def test_examples_path_traversal_rejected(server_url):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(server_url + "/examples/%2e%2e%2fweb.py")
    assert exc.value.code == 404


def test_two_click_roi_protocol(server_url):
    status, j1 = _post(server_url + "/api/click",
                       {"state": None, "xy": [100, 90], "hw": [200, 400]})
    assert status == 200 and not j1["ready"]
    assert j1["sections"][0]["label"] == POINT_LABEL
    status, j2 = _post(server_url + "/api/click",
                       {"state": j1["state"], "xy": [20, 130],
                        "hw": [200, 400]})
    assert status == 200 and j2["ready"]
    assert j2["sections"][0]["label"] == ROI_LABEL
    assert j2["box"] == [20, 90, 100, 130]  # corners sorted


def _data_url(img):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return ("data:image/png;base64,"
            + base64.b64encode(buf.getvalue()).decode())


def test_edit_endpoint_end_to_end(server_url):
    img = np.random.RandomState(0).randint(0, 255, (120, 160, 3), np.uint8)
    status, j = _post(server_url + "/api/edit", {
        "image": _data_url(img), "text": "TPU", "steps": 2,
        "sampler": "ddim", "box": [40, 50, 100, 70]})
    assert status == 200, j
    out = _decode_b64_png(j["image"])
    mask = _decode_b64_png(j["mask"])
    assert out.shape == img.shape and out.dtype == np.uint8
    assert mask.shape[:2] == img.shape[:2]
    assert set(np.unique(mask)) <= {0, 255}  # mask*255, like the reference
    # paste-back touches only the box region
    outside = np.ones(img.shape[:2], bool)
    outside[50:70, 40:100] = False
    np.testing.assert_array_equal(out[outside], img[outside])


def test_cli_edit_tiny(tmp_path, monkeypatch):
    """serve/cli.py end-to-end at --scale tiny: reads an image, writes the
    edited image + mask (the reference's one-shot text_editing call as a
    shell command)."""
    import cv2

    from diffute_tpu.serve import cli

    src = tmp_path / "in.png"
    img = np.random.RandomState(1).randint(0, 255, (96, 128, 3), np.uint8)
    cv2.imwrite(str(src), img[..., ::-1])
    out = tmp_path / "out.png"
    mask_out = tmp_path / "mask.png"
    monkeypatch.setattr("sys.argv", [
        "cli", "--image", str(src), "--box", "30,40,90,60", "--text", "TPU",
        "--steps", "2", "--scale", "tiny", "--out", str(out),
        "--mask-out", str(mask_out)])
    cli.main()
    edited = cv2.imread(str(out))
    assert edited is not None and edited.shape == img.shape
    mask = cv2.imread(str(mask_out), cv2.IMREAD_GRAYSCALE)
    assert mask is not None and set(np.unique(mask)) <= {0, 255}


def test_edit_errors_are_400(server_url):
    img = np.zeros((64, 64, 3), np.uint8)
    for bad in ({"image": _data_url(img), "text": "", "steps": 2,
                 "box": [1, 1, 30, 30]},              # empty text
                {"image": _data_url(img), "text": "x", "steps": 2,
                 "box": [10, 10, 10, 40]},            # degenerate box
                {"image": _data_url(img), "text": "x", "steps": 2,
                 "sampler": "euler", "box": [1, 1, 30, 30]}):  # bad sampler
        status, j = _post(server_url + "/api/edit", bad)
        assert status == 400 and "error" in j
    status, j = _post(server_url + "/api/edit", {"text": "x"})  # no image
    assert status == 400
