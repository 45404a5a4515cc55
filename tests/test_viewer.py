"""SIBR remote-viewer protocol server over a loopback socket."""

import json
import math
import socket
import threading

import numpy as np

from gs_tpu.config import RasterizeConfig
from gs_tpu.models import gaussians
from gs_tpu.viewer.network_gui import GuiServer


def _client_message(w, h, view, viewproj, train=True, keep_alive=False):
    return {
        "resolution_x": w, "resolution_y": h,
        "train": train,
        "fov_y": math.radians(60), "fov_x": math.radians(60),
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": keep_alive,
        "scaling_modifier": 1.0,
        "view_matrix": view, "view_projection_matrix": viewproj,
    }


class _FakeTrainState:
    def __init__(self, state):
        self.state = state
        self.active_sh_degree = 0
        self.iteration = 1


class TestGuiServer:
    def test_protocol_roundtrip(self):
        rng = np.random.default_rng(0)
        st = gaussians.create_from_pcd(
            rng.uniform(-1, 1, (32, 3)).astype(np.float32),
            rng.uniform(0, 1, (32, 3)).astype(np.float32),
            max_sh_degree=0, capacity=32,
        )
        server = GuiServer("127.0.0.1", 0, source_path="/data/scene")
        port = server.listener.getsockname()[1]
        ts = _FakeTrainState(st)
        w = h = 16

        # reference wire convention: transposed (row-vector) matrices with
        # Y/Z column flips applied on receipt (network_gui.py:79-82)
        view = np.eye(4, dtype=np.float32)
        view[3, :3] = [0.0, 0.0, 4.0]  # transposed translation row
        flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        wire_view = (view @ flip)  # so that flipping on receipt recovers view
        wire_viewproj = np.eye(4, dtype=np.float32)  # only sanity-checked

        received = {}

        def client():
            conn = socket.create_connection(("127.0.0.1", port), timeout=240)
            msg = json.dumps(_client_message(
                w, h, wire_view.reshape(-1).tolist(),
                wire_viewproj.reshape(-1).tolist(),
            )).encode()
            conn.sendall(len(msg).to_bytes(4, "little"))
            conn.sendall(msg)
            img = b""
            while len(img) < w * h * 3:
                img += conn.recv(w * h * 3 - len(img))
            n = int.from_bytes(conn.recv(4), "little")
            verify = conn.recv(n).decode("ascii")
            received["image"] = img
            received["verify"] = verify
            conn.close()

        t = threading.Thread(target=client)
        t.start()
        try:
            import time

            deadline = time.time() + 60
            while server.conn is None and time.time() < deadline:
                server.try_connect()
                time.sleep(0.02)
            assert server.conn is not None, "client never connected"
            server.poll(ts, RasterizeConfig(backend="xla", chunk=32))
            t.join(timeout=240)
        finally:
            server.close()
        assert received["verify"] == "/data/scene"
        assert len(received["image"]) == w * h * 3

    def test_zero_resolution_is_idle_ping(self):
        server = GuiServer("127.0.0.1", 0)
        port = server.listener.getsockname()[1]
        result = {}

        def client():
            conn = socket.create_connection(("127.0.0.1", port), timeout=240)
            msg = json.dumps(_client_message(0, 0, [], [])).encode()
            conn.sendall(len(msg).to_bytes(4, "little"))
            conn.sendall(msg)
            n = int.from_bytes(conn.recv(4), "little")
            result["verify"] = conn.recv(n).decode("ascii")
            conn.close()

        t = threading.Thread(target=client)
        t.start()
        try:
            import time

            deadline = time.time() + 60
            while server.conn is None and time.time() < deadline:
                server.try_connect()
                time.sleep(0.02)
            assert server.conn is not None
            # directly exercise receive/send for the idle message
            cam, do_training, keep_alive, _ = server.receive()
            assert cam is None
            server.send(None, server.source_path)
            t.join(timeout=240)
        finally:
            server.close()
        assert result["verify"] == ""
