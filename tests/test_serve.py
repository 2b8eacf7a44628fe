"""HTTP serving surface (cli/serve.py): session lifecycle, chunk-wrap
correctness on short clips, and the error paths, against a toy-config
server with random generator params."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import numpy as np
import pytest

from wacv23_tsnet_tpu.cli.serve import Server, make_handler
from wacv23_tsnet_tpu.configs import toy_config
from wacv23_tsnet_tpu.models import TSNetModules

CFG = toy_config()
HW = CFG.image_size
S = CFG.n_source
N_FRAMES = 3
CHUNK = 4  # > N_FRAMES so the last (only) chunk wraps


def _post(url, payload, raw=None):
    body = raw if raw is not None else json.dumps(payload).encode()
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


def _get(url):
    try:
        with urllib.request.urlopen(url) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


@pytest.fixture(scope="module")
def served():
    params = TSNetModules(CFG).init_generator_params(jax.random.PRNGKey(0))
    server = Server(CFG, params, chunk=CHUNK)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, server, params
    httpd.shutdown()


def _session_payload(rng):
    return {
        "src_img": rng.integers(0, 256, (S, HW, HW, 3)).tolist(),
        "src_lbl": rng.integers(0, CFG.label_nc, (S, HW, HW)).tolist(),
        "src_bbox": rng.integers(0, 2, (S, HW, HW)).tolist(),
    }


def _keypoints(rng, f):
    # landmarks inside the crop, in pixel coords
    return rng.uniform(8, HW - 8, (f, 68, 2))


def test_healthz(served):
    base, _, _ = served
    status, body = _get(base + "/healthz")
    assert status == 200 and body["ok"] is True
    assert body["backend"] == jax.default_backend()


def test_session_lifecycle_and_chunk_wrap(served):
    base, server, params = served
    rng = np.random.default_rng(0)
    payload = _session_payload(rng)
    status, body = _post(base + "/session", payload)
    assert status == 200
    sid = body["session"]
    assert sid in server.sessions

    kp = _keypoints(rng, N_FRAMES)
    status, body = _post(base + "/frames",
                         {"session": sid, "keypoints": kp.tolist()})
    assert status == 200
    frames = np.asarray(body["frames"], np.uint8)
    assert frames.shape == (N_FRAMES, HW, HW, 3)
    assert body["ms"] > 0

    # chunk-wrap correctness: the server's chunk (4) pads the 3-frame
    # clip by wrapping; an exact-size session must give the same frames
    from wacv23_tsnet_tpu.infer.streaming import RetargetSession
    mean = CFG.img_mean_array()
    src_img = (np.asarray(payload["src_img"], np.float32) - mean) / 255.0
    from wacv23_tsnet_tpu.data.codecs import labels_to_onehot
    src_lbl = np.transpose(
        labels_to_onehot(np.asarray(payload["src_lbl"], np.uint8), "face"),
        (0, 2, 3, 1))
    src_bbox = np.asarray(payload["src_bbox"], np.float32)
    session = RetargetSession(CFG, params, src_img, src_lbl, src_bbox,
                              chunk=N_FRAMES)
    rec = session.push_keypoints(kp.astype(np.float32))
    want = np.clip(rec + mean / 255.0, 0.0, 1.0)[..., ::-1] * 255.0
    assert np.abs(frames.astype(np.float32) - want).max() <= 1.0  # uint8 LSB


def test_frames_unknown_session(served):
    base, _, _ = served
    status, body = _post(base + "/frames",
                         {"session": "nope", "keypoints": [[[0, 0]]]})
    assert status == 404 and "unknown session" in body["error"]


def test_session_missing_key_is_400(served):
    base, _, _ = served
    rng = np.random.default_rng(1)
    payload = _session_payload(rng)
    del payload["src_lbl"]
    status, body = _post(base + "/session", payload)
    assert status == 400 and "src_lbl" in body["error"]


def test_session_ragged_shape_is_400(served):
    base, _, _ = served
    rng = np.random.default_rng(2)
    payload = _session_payload(rng)
    payload["src_img"][0] = payload["src_img"][0][:-1]  # ragged rows
    status, _ = _post(base + "/session", payload)
    assert status == 400


def test_frames_missing_session_key_is_400(served):
    base, _, _ = served
    status, _ = _post(base + "/frames", {"keypoints": [[[0, 0]]]})
    # payload.get("session") -> None -> not in sessions -> 404 contract
    assert status == 404


def test_malformed_json_is_400(served):
    base, _, _ = served
    status, _ = _post(base + "/session", None, raw=b"{not json")
    assert status == 400


def test_unknown_paths_are_404(served):
    base, _, _ = served
    assert _get(base + "/nope")[0] == 404
    assert _post(base + "/nope", {})[0] == 404


def test_frames_base64_encoding(served):
    import base64
    base, _, _ = served
    rng = np.random.default_rng(3)
    status, body = _post(base + "/session", _session_payload(rng))
    assert status == 200
    sid = body["session"]
    kp = _keypoints(rng, N_FRAMES)
    status, plain = _post(base + "/frames",
                          {"session": sid, "keypoints": kp.tolist()})
    assert status == 200
    status, b64 = _post(base + "/frames",
                        {"session": sid, "keypoints": kp.tolist(),
                         "encoding": "base64"})
    assert status == 200 and b64["dtype"] == "uint8"
    frames = np.frombuffer(base64.b64decode(b64["frames_b64"]),
                           np.uint8).reshape(b64["shape"])
    np.testing.assert_array_equal(frames,
                                  np.asarray(plain["frames"], np.uint8))
