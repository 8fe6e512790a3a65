"""HTTP detection server (serve/server.py) against a CPU artifact: health,
detection schema parity with the predict path, error handling."""

import http.client
import io
import json
import threading

import jax
import numpy as np
import pytest
from PIL import Image

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.models.detector import FasterRCNN
from wssdl_bus_tpu.serve import export_serving, report_detections
from wssdl_bus_tpu.serve.server import serve
from wssdl_bus_tpu.train.engine import Engine

CANVAS = (96, 128)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg = Config().with_overrides([
        "TEST.RPN_PRE_NMS_TOP_N", "200", "TEST.RPN_POST_NMS_TOP_N", "32",
        "TEST.SCALES", "(90,)", "TEST.MAX_SIZE", "128",
    ])
    model = FasterRCNN(backbone="VGGnet")
    eng = Engine(model, cfg, CANVAS)
    variables, _ = eng.init(jax.random.PRNGKey(0))
    art = str(tmp_path_factory.mktemp("srv_artifact"))
    export_serving(eng, variables, art, "VGGnet_test", batch_sizes=(1,))

    httpd = serve(art, host="127.0.0.1", port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd, eng, variables
    httpd.shutdown()


def _png_bytes(im: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(im).save(buf, format="PNG")
    return buf.getvalue()


def _request(httpd, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", httpd.server_port,
                                      timeout=120)
    conn.request(method, path, body=body)
    r = conn.getresponse()
    out = (r.status, json.loads(r.read().decode()))
    conn.close()
    return out


@pytest.mark.slow
def test_healthz(server):
    httpd, _, _ = server
    code, obj = _request(httpd, "GET", "/healthz")
    assert code == 200
    assert obj["status"] == "ok"
    assert obj["batch_sizes"] == [1]
    assert obj["canvas_hw"] == list(CANVAS)


@pytest.mark.slow
def test_detect_matches_library_path(server):
    httpd, eng, variables = server
    im = np.full((100, 120), 128, np.uint8)
    im[30:60, 40:90] = 200
    code, obj = _request(httpd, "POST", "/detect?thresh=0.0",
                         body=_png_bytes(im))
    assert code == 200
    assert obj["image_hw"] == [100, 120]

    from wssdl_bus_tpu.evaluate.detect import im_detect
    scores, boxes = im_detect(eng, variables, im, "VGGnet_test", CANVAS)
    want, _ = report_detections(scores, boxes, eng.cfg, thresh=0.0)
    assert obj["detections"] == json.loads(json.dumps(want))


@pytest.mark.slow
def test_bad_requests(server):
    httpd, _, _ = server
    code, obj = _request(httpd, "GET", "/nope")
    assert code == 404
    code, obj = _request(httpd, "POST", "/detect")
    assert code == 400 and "empty" in obj["error"]
    code, obj = _request(httpd, "POST", "/detect", body=b"not an image")
    assert code == 400 and "decode" in obj["error"]
    code, obj = _request(httpd, "POST", "/detect?thresh=abc", body=b"x")
    assert code == 400
    # non-finite thresholds are rejected (NaN would silently drop all
    # detections and is invalid JSON for strict clients)
    code, obj = _request(httpd, "POST", "/detect?thresh=nan", body=b"x")
    assert code == 400
    code, obj = _request(httpd, "POST", "/detect?thresh=inf", body=b"x")
    assert code == 400


@pytest.mark.slow
def test_oversized_body_rejected(server, monkeypatch):
    import wssdl_bus_tpu.serve.server as srv
    httpd, _, _ = server
    monkeypatch.setattr(srv, "MAX_BODY_BYTES", 16)
    code, obj = _request(httpd, "POST", "/detect", body=b"x" * 17)
    assert code == 413


@pytest.mark.slow
def test_internal_fault_is_500(server, monkeypatch):
    httpd, _, _ = server
    im = np.full((40, 40), 128, np.uint8)

    def boom(images):
        raise RuntimeError("device fell over")
    monkeypatch.setattr(httpd.service.served, "detect", boom)
    code, obj = _request(httpd, "POST", "/detect", body=_png_bytes(im))
    assert code == 500 and "device fell over" in obj["error"]

# ------------------------------------------------------------------ #
# DynamicBatcher: request coalescing
# ------------------------------------------------------------------ #
def test_dynamic_batcher_coalesces():
    """While a step is in flight, queued requests ride the NEXT step
    together (capped by max_batch) — deterministic via a gated backend."""
    from wssdl_bus_tpu.serve.server import DynamicBatcher

    release = threading.Event()
    first_entered = threading.Event()

    class Fake:
        batch_sizes = [1, 4]

        def detect(self, images):
            if not first_entered.is_set():
                first_entered.set()
                release.wait(timeout=30)
            return [("r", int(im)) for im in images]

    b = DynamicBatcher(Fake())
    results = {}

    def submit(i):
        results[i] = b.detect_one(i)

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(8)]
    threads[0].start()
    assert first_entered.wait(timeout=30)  # worker is inside step 1
    for t in threads[1:]:
        t.start()
    # wait until the remaining 7 are queued, then release the gate
    for _ in range(3000):
        with b._cv:
            if len(b._queue) == 7:
                break
        import time
        time.sleep(0.01)
    release.set()
    for t in threads:
        t.join(timeout=30)
    b.close()
    assert results == {i: ("r", i) for i in range(8)}
    assert b.step_sizes[0] == 1          # the lone first request
    assert max(b.step_sizes) <= 4        # capped by the exported batch
    assert sorted(list(b.step_sizes)[1:]) == [3, 4]  # 7 queued -> 4 + 3


def test_dynamic_batcher_step_failure_is_scoped():
    """A device failure fails exactly the requests in that step; the
    batcher keeps serving afterwards."""
    from wssdl_bus_tpu.serve.server import DynamicBatcher

    class Flaky:
        batch_sizes = [2]
        calls = 0

        def detect(self, images):
            Flaky.calls += 1
            if Flaky.calls == 1:
                raise RuntimeError("transient")
            return [("ok", int(im)) for im in images]

    b = DynamicBatcher(Flaky())
    with pytest.raises(RuntimeError, match="transient"):
        b.detect_one(0)
    assert b.detect_one(1) == ("ok", 1)
    b.close()


@pytest.mark.slow
def test_concurrent_requests_all_served(server):
    """End-to-end: concurrent POSTs against the real artifact all return
    200 with the detection schema."""
    httpd, _, _ = server
    im = np.full((60, 80), 100, np.uint8)
    im[10:40, 20:60] = 220
    body = _png_bytes(im)
    outs = {}

    def hit(i):
        outs[i] = _request(httpd, "POST", "/detect", body=body)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(outs) == 6
    for code, obj in outs.values():
        assert code == 200
        assert obj["image_hw"] == [60, 80]
        assert isinstance(obj["detections"], list)


@pytest.mark.slow
def test_metrics_endpoint(server):
    httpd, _, _ = server
    im = np.full((50, 50), 90, np.uint8)
    code, _ = _request(httpd, "POST", "/detect", body=_png_bytes(im))
    assert code == 200
    code, _ = _request(httpd, "POST", "/detect", body=b"not an image")
    assert code == 400
    code, m = _request(httpd, "GET", "/metrics")
    assert code == 200
    assert m["requests"] >= 2
    assert m["client_errors"] >= 1
    assert m["device_steps"] >= 1
    assert sum(int(k) * v for k, v in
               m["images_per_step_histogram"].items()) >= 1
    assert m["latency_s"]["p50"] > 0
    assert m["latency_s"]["max"] >= m["latency_s"]["p50"]


def test_pick_batch_snaps_to_exported_sizes():
    """Low queue depth must NOT pad up to a big exported program: snap up
    only when the queue fills at least half of the next export."""
    from wssdl_bus_tpu.serve.server import DynamicBatcher

    class Fake:
        batch_sizes = [1, 8, 32]

        def detect(self, images):
            return [None] * len(images)

    b = DynamicBatcher(Fake())
    try:
        assert b._pick_batch(1) == 1      # lone request: batch-1 program
        assert b._pick_batch(2) == 1      # 2 < 8/2: don't pad to 8
        assert b._pick_batch(4) == 4      # 4 >= 8/2: one padded batch-8
        assert b._pick_batch(8) == 8
        assert b._pick_batch(12) == 8     # 12 < 32/2: drain 8, rest next
        assert b._pick_batch(16) == 16    # >= 32/2: one padded batch-32
        assert b._pick_batch(100) == 32   # capped at the largest export
    finally:
        b.close()


def test_batcher_failed_steps_not_in_histogram():
    from wssdl_bus_tpu.serve.server import DynamicBatcher

    class Flaky2:
        batch_sizes = [1]
        calls = 0

        def detect(self, images):
            Flaky2.calls += 1
            if Flaky2.calls == 1:
                raise RuntimeError("boom")
            return [("ok", int(im)) for im in images]

    b = DynamicBatcher(Flaky2())
    with pytest.raises(RuntimeError, match="boom"):
        b.detect_one(0)
    assert b.detect_one(5) == ("ok", 5)
    b.close()
    assert b.failed_steps == 1
    assert b.total_steps == 2
    assert list(b.step_sizes) == [1]


def test_batcher_result_count_mismatch_is_error():
    from wssdl_bus_tpu.serve.server import DynamicBatcher

    class Short:
        batch_sizes = [1]

        def detect(self, images):
            return []  # one result too few

    b = DynamicBatcher(Short())
    with pytest.raises(RuntimeError, match="0 results for 1"):
        b.detect_one(1)
    b.close()
