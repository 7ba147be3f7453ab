"""Serving stack tests: archive round-trip, async facade, HTTP server.

Analog of the reference's deployment/async surface
(``tools/deployment/mmdet2torchserve.py``, ``tests/test_async.py``).
Uses a stub detector so the server logic is tested without model
compiles; the real ``Detector`` facade is covered by test_apis.py.
"""

import asyncio
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from glsdet_tpu.serve import (AsyncDetector, DetectionService,
                              archive_model, async_inference_detector,
                              load_archive, make_server)


class StubDetector:
    class_names = ["car", "person"]

    def detect(self, image):
        h, w = image.shape[:2]
        return {
            "boxes": np.array([[1.0, 2.0, w - 1.0, h - 1.0]], np.float32),
            "scores": np.array([0.9], np.float32),
            "labels": np.array([1], np.int64),
        }


class TestArchive:
    def test_round_trip(self, tmp_path):
        ckpt = tmp_path / "ckpt"
        (ckpt / "sub").mkdir(parents=True)
        (ckpt / "a.bin").write_bytes(b"weights")
        (ckpt / "sub" / "b.json").write_text("{}")
        out = archive_model("yolox_s_visdrone", str(ckpt),
                            str(tmp_path / "m"), model_name="coarse",
                            class_names=["car"], score_thr=0.25)
        assert out.endswith(".gtar")
        manifest, ckpt_dir = load_archive(out, str(tmp_path / "un"))
        assert manifest["model_name"] == "coarse"
        assert manifest["config_name"] == "yolox_s_visdrone"
        assert manifest["score_thr"] == 0.25
        with open(f"{ckpt_dir}/a.bin", "rb") as f:
            assert f.read() == b"weights"
        with open(f"{ckpt_dir}/sub/b.json") as f:
            assert f.read() == "{}"

    def test_no_overwrite(self, tmp_path):
        out = archive_model("c", None, str(tmp_path / "m"))
        with pytest.raises(FileExistsError):
            archive_model("c", None, str(tmp_path / "m"))
        archive_model("c", None, out, force=True)  # explicit force ok

    def test_no_checkpoint(self, tmp_path):
        out = archive_model("cfg", None, str(tmp_path / "m"))
        manifest, ckpt_dir = load_archive(out, str(tmp_path / "un"))
        assert ckpt_dir is None and manifest["has_checkpoint"] is False


class TestAsync:
    def test_submit_and_map(self):
        det = AsyncDetector(StubDetector())
        imgs = [np.zeros((8 + i, 16, 3), np.uint8) for i in range(5)]
        outs = det.map(imgs)
        assert [o["boxes"][0, 3] for o in outs] == [7, 8, 9, 10, 11]
        det.close()

    def test_exception_propagates(self):
        class Bad:
            def detect(self, image):
                raise ValueError("boom")

        det = AsyncDetector(Bad())
        with pytest.raises(ValueError, match="boom"):
            det.submit(np.zeros((4, 4, 3), np.uint8)).result(timeout=5)
        det.close()

    def test_asyncio_bridge(self):
        det = AsyncDetector(StubDetector())

        async def go():
            a = det.detect_async(np.zeros((10, 10, 3), np.uint8))
            b = async_inference_detector(
                StubDetector(), np.zeros((12, 10, 3), np.uint8))
            ra, rb = await asyncio.gather(a, b)
            return ra, rb

        ra, rb = asyncio.run(go())
        assert ra["boxes"][0, 3] == 9 and rb["boxes"][0, 3] == 11
        det.close()


class TestServer:
    @pytest.fixture()
    def server(self):
        service = DetectionService()
        service.register("stub", StubDetector())
        srv = make_server(service, port=0)  # ephemeral port
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    def _get(self, url):
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, json.loads(r.read())

    def test_ping_and_models(self, server):
        assert self._get(f"{server}/ping")[1] == {"status": "Healthy"}
        assert self._get(f"{server}/models")[1] == {"models": ["stub"]}

    def test_predict_json_array(self, server):
        import base64

        img = np.full((20, 30, 3), 128, np.uint8)
        body = json.dumps({
            "image": base64.b64encode(img.tobytes()).decode(),
            "shape": [20, 30, 3], "dtype": "uint8",
        }).encode()
        req = urllib.request.Request(f"{server}/predictions/stub",
                                     data=body, method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            out = json.loads(r.read())
        assert out == [{"class_name": "person", "class_label": 1,
                        "score": 0.9, "bbox": [1.0, 2.0, 29.0, 19.0]}]

    def test_predict_encoded_image(self, server):
        import cv2

        img = np.full((24, 32, 3), 99, np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(f"{server}/predictions/stub",
                                     data=buf.tobytes(), method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            out = json.loads(r.read())
        assert out[0]["bbox"] == [1.0, 2.0, 31.0, 23.0]

    def test_metrics_endpoint(self, server):
        import base64

        img = np.full((20, 30, 3), 128, np.uint8)
        body = json.dumps({
            "image": base64.b64encode(img.tobytes()).decode(),
            "shape": [20, 30, 3], "dtype": "uint8",
        }).encode()
        for _ in range(3):
            req = urllib.request.Request(f"{server}/predictions/stub",
                                         data=body, method="POST")
            urllib.request.urlopen(req, timeout=10).read()
        with urllib.request.urlopen(f"{server}/metrics", timeout=10) as r:
            assert r.status == 200
            assert "text/plain" in r.headers["Content-Type"]
            text = r.read().decode()
        assert 'glsdet_requests_total{model="stub"} 3' in text
        assert 'glsdet_errors_total{model="stub"} 0' in text
        assert 'quantile="0.5"' in text

    def test_metrics_counts_errors(self, server):
        req = urllib.request.Request(f"{server}/predictions/stub",
                                     data=b"not-an-image", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 500
        with urllib.request.urlopen(f"{server}/metrics", timeout=10) as r:
            text = r.read().decode()
        assert 'glsdet_errors_total{model="stub"} 1' in text

    def test_unknown_model_404(self, server):
        req = urllib.request.Request(f"{server}/predictions/nope",
                                     data=b"x", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 404

    def test_predict_through_async_detector(self):
        """A model registered as AsyncDetector serves /predictions via
        the batching worker (class_names delegated through)."""
        import base64

        service = DetectionService()
        adet = AsyncDetector(StubDetector(), max_batch=4,
                             batch_window_ms=1.0)
        service.register("astub", adet)
        srv = make_server(service, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            img = np.full((20, 30, 3), 128, np.uint8)
            body = json.dumps({
                "image": base64.b64encode(img.tobytes()).decode(),
                "shape": [20, 30, 3], "dtype": "uint8",
            }).encode()
            url = (f"http://127.0.0.1:{srv.server_address[1]}"
                   "/predictions/astub")
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=10) as r:
                out = json.loads(r.read())
            assert out == [{"class_name": "person", "class_label": 1,
                            "score": 0.9, "bbox": [1.0, 2.0, 29.0, 19.0]}]
        finally:
            srv.shutdown()
            adet.close()


class BatchStubDetector(StubDetector):
    """Stub with the dynamic-batching hook; records batch sizes."""

    def __init__(self):
        self.batch_sizes = []

    def detect_batch(self, images):
        self.batch_sizes.append(len(images))
        return [self.detect(im) for im in images]


class TestDynamicBatching:
    def test_batches_and_order(self):
        stub = BatchStubDetector()
        det = AsyncDetector(stub, max_batch=8, batch_window_ms=50.0)
        imgs = [np.zeros((8 + i, 16, 3), np.uint8) for i in range(6)]
        futs = [det.submit(im) for im in imgs]
        outs = [f.result(timeout=10) for f in futs]
        # results map back to the right request despite batching
        assert [o["boxes"][0, 3] for o in outs] == [7, 8, 9, 10, 11, 12]
        # at least one multi-request batch was formed
        assert max(stub.batch_sizes, default=1) > 1
        det.close()

    def test_batch_exception_propagates_to_all(self):
        class Bad(BatchStubDetector):
            def detect_batch(self, images):
                raise RuntimeError("batch boom")

        det = AsyncDetector(Bad(), max_batch=4, batch_window_ms=50.0)
        futs = [det.submit(np.zeros((4, 4, 3), np.uint8))
                for _ in range(3)]
        errs = 0
        for f in futs:
            with pytest.raises((RuntimeError, ValueError)):
                f.result(timeout=10)
            errs += 1
        assert errs == 3
        det.close()

    def test_single_request_uses_detect(self):
        stub = BatchStubDetector()
        det = AsyncDetector(stub, max_batch=8, batch_window_ms=1.0)
        out = det.submit(np.zeros((9, 16, 3), np.uint8)).result(timeout=10)
        assert out["boxes"][0, 3] == 8
        det.close()


class StreamingStubDetector(BatchStubDetector):
    """Implements the submit/advance/collect streaming protocol and
    records the phase-call order so tests can check pipelining."""

    def __init__(self):
        super().__init__()
        self.events = []
        self._n = 0

    def submit_batch(self, images):
        self._n += 1
        self.events.append(("submit", self._n))
        return (self._n, list(images), "submitted")

    def advance_batch(self, handle):
        self.events.append(("advance", handle[0]))
        return (handle[0], handle[1], "advanced")

    def collect_batch(self, handle):
        self.events.append(("collect", handle[0]))
        return [self.detect(im) for im in handle[1]]


class TestStreamingPipeline:
    def test_results_and_order(self):
        stub = StreamingStubDetector()
        det = AsyncDetector(stub, max_batch=2, batch_window_ms=5.0,
                            pipeline_depth=2)
        imgs = [np.zeros((8 + i, 16, 3), np.uint8) for i in range(8)]
        futs = [det.submit(im) for im in imgs]
        outs = [f.result(timeout=10) for f in futs]
        assert [o["boxes"][0, 3] for o in outs] == [7 + i for i in range(8)]
        # every submitted batch was advanced then collected, in order
        subs = [n for e, n in stub.events if e == "submit"]
        cols = [n for e, n in stub.events if e == "collect"]
        advs = [n for e, n in stub.events if e == "advance"]
        assert cols == sorted(cols) == subs == advs
        det.close()

    def test_overlap_under_load(self):
        """With a full queue, batch N+1 is submitted before batch N is
        collected (two batches genuinely in flight)."""
        import time as _time

        class Slow(StreamingStubDetector):
            def collect_batch(self, handle):
                _time.sleep(0.005)   # let the request queue fill
                return super().collect_batch(handle)

        stub = Slow()
        det = AsyncDetector(stub, max_batch=1, batch_window_ms=0.0,
                            pipeline_depth=2)
        futs = [det.submit(np.zeros((8, 16, 3), np.uint8))
                for _ in range(6)]
        for f in futs:
            f.result(timeout=10)
        det.close()
        order = {(e, n): i for i, (e, n) in enumerate(stub.events)}
        overlapped = any(
            order.get(("submit", n + 1), 1 << 30) < order[("collect", n)]
            for n in range(1, stub._n))
        assert overlapped, stub.events

    def test_exception_in_advance_propagates(self):
        class Bad(StreamingStubDetector):
            def advance_batch(self, handle):
                raise RuntimeError("advance boom")

        det = AsyncDetector(Bad(), max_batch=4, batch_window_ms=5.0,
                            pipeline_depth=2)
        futs = [det.submit(np.zeros((4, 4, 3), np.uint8))
                for _ in range(3)]
        for f in futs:
            with pytest.raises(RuntimeError, match="advance boom"):
                f.result(timeout=10)
        det.close()

    def test_depth_one_uses_legacy_path(self):
        stub = StreamingStubDetector()
        det = AsyncDetector(stub, max_batch=4, batch_window_ms=5.0,
                            pipeline_depth=1)
        out = det.submit(np.zeros((9, 16, 3), np.uint8)).result(timeout=10)
        assert out["boxes"][0, 3] == 8
        assert stub.events == []  # streaming protocol not engaged
        det.close()


class TestTwoStageArchive:
    """Two-stage (.gtar pipeline="two_stage") archives: the UFPMP
    pipeline behind the torchserve-style service."""

    def test_manifest_and_ckpt_roundtrip(self, tmp_path):
        from glsdet_tpu.serve import archive_model, load_archive

        cdir = tmp_path / "ckpt_c"
        mdir = tmp_path / "ckpt_m"
        cdir.mkdir(); mdir.mkdir()
        (cdir / "c.bin").write_bytes(b"coarse")
        (mdir / "m.bin").write_bytes(b"mp")
        out = archive_model("coarse_det", str(cdir),
                            str(tmp_path / "two"),
                            model_name="ufpmp",
                            mp_config="mp_det_res50",
                            mp_checkpoint_dir=str(mdir))
        manifest, ckpts = load_archive(out, str(tmp_path / "w"))
        assert manifest["pipeline"] == "two_stage"
        assert manifest["mp_config_name"] == "mp_det_res50"
        assert manifest["fuse_global"] is True
        assert open(os.path.join(ckpts["coarse"], "c.bin"), "rb").read() \
            == b"coarse"
        assert open(os.path.join(ckpts["mp"], "m.bin"), "rb").read() == b"mp"

    def test_single_stage_roundtrip_unchanged(self, tmp_path):
        from glsdet_tpu.serve import archive_model, load_archive

        out = archive_model("coarse_det", None, str(tmp_path / "one"))
        manifest, ckpt = load_archive(out)
        assert "pipeline" not in manifest
        assert ckpt is None

    def test_register_and_predict_two_stage(self, tmp_path):
        import base64
        import functools

        from glsdet_tpu.apis import TwoStageDetector
        from glsdet_tpu.serve import DetectionService, archive_model

        out = archive_model("coarse_det", None, str(tmp_path / "ts"),
                            model_name="ufpmp",
                            mp_config="mp_det_res50")
        tiny = functools.partial(
            TwoStageDetector,
            coarse_options={"model.phi": "nano", "model.dtype": "float32",
                            "data.img_hw": (128, 128),
                            "eval.mosaic_buckets": (256,),
                            "eval.coarse_score_thr": 1e-4,
                            "eval.max_regions": 8},
            mp_options={"model.depth": 18, "model.dtype": "float32"})
        service = DetectionService()
        name = service.register_archive(out, detector_cls=tiny)
        assert name == "ufpmp"
        det = service.models[name][0]
        assert det.pipeline.fuse_global

        img = np.random.RandomState(0).randint(
            0, 255, (160, 160, 3), np.uint8)
        body = json.dumps({
            "image": base64.b64encode(img.tobytes()).decode(),
            "shape": [160, 160, 3], "dtype": "uint8",
        }).encode()
        results = service.predict(name, body)
        assert isinstance(results, list)
        for r in results:
            assert set(r) == {"class_name", "class_label", "score", "bbox"}
            assert r["score"] >= det.score_thr - 1e-6
