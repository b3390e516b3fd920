"""oss:// backend + read-through cache against an in-process HTTP server.

The server emulates Aliyun OSS path-style GETs and VERIFIES the request
signature with the same header scheme real OSS enforces, so a signing bug
fails the test rather than only failing in production.
"""

import base64
import hashlib
import hmac
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from diffute_tpu.io.oss import OSSClient, read_through_cache, register_oss
from diffute_tpu.io.storage import _OPENERS, open_blob, read_image

KEY_ID, SECRET = "test-key-id", "test-secret"


class _FakeOSS(BaseHTTPRequestHandler):
    blobs = {}
    require_auth = True
    hits = []

    def do_GET(self):
        self.__class__.hits.append(self.path)
        if self.require_auth:
            date = self.headers.get("Date", "")
            to_sign = f"GET\n\n\n{date}\n{self.path}"
            want = "OSS %s:%s" % (KEY_ID, base64.b64encode(
                hmac.new(SECRET.encode(), to_sign.encode(),
                         hashlib.sha1).digest()).decode())
            if self.headers.get("Authorization") != want:
                self.send_response(403)
                self.end_headers()
                return
        blob = self.blobs.get(self.path)
        if blob is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(blob)))
        self.end_headers()
        self.wfile.write(blob)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def fake_oss():
    _FakeOSS.blobs = {"/bkt/data/hello.txt": b"hello oss"}
    _FakeOSS.hits = []
    _FakeOSS.require_auth = True
    server = HTTPServer(("127.0.0.1", 0), _FakeOSS)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()
    _OPENERS.pop("oss", None)


def _client(endpoint, **kw):
    return OSSClient(endpoint, KEY_ID, SECRET, path_style=True, **kw)


def test_signed_get_round_trip(fake_oss):
    c = _client(fake_oss)
    assert c.get("oss://bkt/data/hello.txt") == b"hello oss"


def test_bad_signature_rejected(fake_oss):
    c = OSSClient(fake_oss, KEY_ID, "wrong-secret", path_style=True)
    with pytest.raises(PermissionError):
        c.get("oss://bkt/data/hello.txt")


def test_missing_key_raises(fake_oss):
    with pytest.raises(FileNotFoundError):
        _client(fake_oss).get("oss://bkt/nope.txt")


def test_anonymous_get_for_public_bucket(fake_oss):
    _FakeOSS.require_auth = False
    c = OSSClient(fake_oss, access_key_id=None, access_key_secret=None,
                  path_style=True)
    assert c.get("oss://bkt/data/hello.txt") == b"hello oss"


def test_url_parsing_and_styles():
    assert OSSClient.parse("oss://b/k/with/slashes") == ("b", "k/with/slashes")
    with pytest.raises(ValueError):
        OSSClient.parse("oss://bucket-only")
    with pytest.raises(ValueError):
        OSSClient.parse("gs://b/k")
    c = OSSClient("oss-cn-x.aliyuncs.com", "i", "s")
    assert c.url_for("bkt", "k") == "https://bkt.oss-cn-x.aliyuncs.com/k"
    c = OSSClient("http://127.0.0.1:1", "i", "s", path_style=True)
    assert c.url_for("bkt", "k") == "http://127.0.0.1:1/bkt/k"


def test_registered_scheme_feeds_open_blob_and_read_image(fake_oss, tmp_path):
    import cv2

    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 0] = 200  # red in RGB
    ok, buf = cv2.imencode(".png", img[..., ::-1])  # cv2 encodes BGR
    assert ok
    _FakeOSS.blobs["/bkt/img.png"] = buf.tobytes()

    register_oss(fake_oss, KEY_ID, SECRET, path_style=True)
    with open_blob("oss://bkt/data/hello.txt") as f:
        assert f.read() == b"hello oss"
    decoded = read_image("oss://bkt/img.png")
    assert decoded[0, 0, 0] == 200  # RGB order preserved end to end


def test_read_through_cache_hits_network_once(fake_oss, tmp_path):
    c = _client(fake_oss)
    cached = read_through_cache(c.opener(), str(tmp_path))
    assert cached("oss://bkt/data/hello.txt").read() == b"hello oss"
    n_after_first = len(_FakeOSS.hits)
    for _ in range(3):
        assert cached("oss://bkt/data/hello.txt").read() == b"hello oss"
    assert len(_FakeOSS.hits) == n_after_first  # served from disk


def test_cache_registered_via_register_oss(fake_oss, tmp_path):
    register_oss(fake_oss, KEY_ID, SECRET, path_style=True,
                 cache_dir=str(tmp_path))
    with open_blob("oss://bkt/data/hello.txt") as f:
        assert f.read() == b"hello oss"
    hits = len(_FakeOSS.hits)
    with open_blob("oss://bkt/data/hello.txt") as f:
        assert f.read() == b"hello oss"
    assert len(_FakeOSS.hits) == hits


def test_keys_with_spaces_and_unicode(fake_oss):
    _FakeOSS.require_auth = False
    _FakeOSS.blobs["/bkt/scans/%E5%8F%91%E7%A5%A8%202023.png"] = b"img"
    c = OSSClient(fake_oss, access_key_id=None, access_key_secret=None,
                  path_style=True)
    assert c.get("oss://bkt/scans/发票 2023.png") == b"img"
