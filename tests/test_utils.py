"""Tests for the observability utilities (metrics, markers, tf stream)."""

import json
import time

import numpy as np

from hdl_graph_slam_tpu.utils.metrics import StageTimer
from hdl_graph_slam_tpu.utils.tf import Map2OdomPublisher


class TestStageTimer:
    def test_spans_accumulate(self):
        t = StageTimer()
        with t.span("a"):
            time.sleep(0.01)
        with t.span("a"):
            time.sleep(0.01)
        with t.span("b"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["a"]["total_s"] >= 0.02
        assert "b" in s

    def test_chrome_trace_export(self, tmp_path):
        t = StageTimer()
        with t.span("x"):
            pass
        p = str(tmp_path / "trace.json")
        t.dump_chrome_trace(p)
        data = json.load(open(p))
        assert data["traceEvents"][0]["name"] == "x"
        assert data["traceEvents"][0]["ph"] == "X"


class TestMap2Odom:
    def test_update_and_read(self):
        pub = Map2OdomPublisher()
        T = np.eye(4)
        T[0, 3] = 2.0
        pub.update(T)
        np.testing.assert_allclose(pub.odom_to_map(), T)
        np.testing.assert_allclose(pub.map_to_odom(), np.linalg.inv(T))

    def test_subscriber_pump(self):
        pub = Map2OdomPublisher(rate_hz=100.0)
        got = []
        pub.subscribe(lambda T: got.append(T.copy()))
        pub.start()
        time.sleep(0.08)
        pub.stop()
        assert len(got) >= 2


class TestMarkers:
    def test_graph_export(self, tmp_path):
        from hdl_graph_slam_tpu.backend import HdlGraphSlam
        from hdl_graph_slam_tpu.core import cloud as cloudlib
        from hdl_graph_slam_tpu.core.config import SlamConfig
        from hdl_graph_slam_tpu.utils.markers import save_graph_json, save_graph_ply

        rng = np.random.default_rng(0)
        cfg = SlamConfig()
        cfg.backend.keyframe_delta_trans = 0.5
        cfg.backend.max_keyframes_per_update = 100
        slam = HdlGraphSlam(cfg)
        cloud = cloudlib.from_numpy(rng.uniform(-5, 5, (200, 3)).astype(np.float32))
        for i in range(4):
            T = np.eye(4)
            T[0, 3] = float(i)
            slam.add_frame(float(i), T, cloud)
        slam.optimize_cycle()

        pj = str(tmp_path / "g.json")
        save_graph_json(slam, pj)
        g = json.load(open(pj))
        assert len(g["nodes"]) == 4
        assert "se3_se3" in g["edges"]

        pp = str(tmp_path / "g.ply")
        save_graph_ply(slam, pp)
        txt = open(pp).read()
        assert "element vertex 4" in txt
        assert "element edge 3" in txt
