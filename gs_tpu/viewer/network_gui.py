"""SIBR remote-viewer protocol server (reference ``network_gui.py:24-90``).

Speaks the exact wire protocol of ``SIBR_remoteGaussian_app`` so existing
viewers can watch a TPU training job:

  client -> server: 4-byte little-endian length + JSON with keys
    resolution_x/y, train, fov_y, fov_x, z_near, z_far, shs_python,
    rot_scale_python, keep_alive, scaling_modifier, view_matrix,
    view_projection_matrix                        (network_gui.py:61-83)
  server -> client: raw H*W*3 uint8 RGB bytes, then 4-byte length +
    ascii source-path verification string          (network_gui.py:53-59)

Matrix convention: the viewer sends flattened row-major matrices in the
reference's transposed (row-vector) storage with Y/Z sign flips applied on
receipt (network_gui.py:79-82). We apply the same flips and transpose into
this framework's column-vector convention (see gs_tpu.cameras docstring).
"""

from __future__ import annotations

import json
import socket
import traceback

import numpy as np

from gs_tpu import cameras


class GuiServer:
    """Non-blocking listener polled once per training iteration."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6009,
                 source_path: str = ""):
        self.host, self.port = host, port
        self.source_path = source_path
        self.conn = None
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)  # non-blocking accept (network_gui.py:33)
        # live-toggleable pipeline flags (train.py:66)
        self.convert_SHs_python = False
        self.compute_cov3D_python = False

    def try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except OSError:
            pass

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            part = self.conn.recv(n - len(buf))
            if not part:
                raise ConnectionError("viewer closed")
            buf += part
        return buf

    def read(self) -> dict:
        n = int.from_bytes(self._read_exact(4), "little")
        return json.loads(self._read_exact(n).decode("utf-8"))

    def send(self, image_bytes: bytes | None, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """-> (camera|None, do_training, keep_alive, scaling_modifier).

        Also updates the live shs/cov python-path toggles, mirroring how the
        reference patches ``pipe`` in the training loop (train.py:66).
        """
        msg = self.read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None
        try:
            do_training = bool(msg["train"])
            fovy, fovx = msg["fov_y"], msg["fov_x"]
            znear, zfar = msg["z_near"], msg["z_far"]
            self.convert_SHs_python = bool(msg["shs_python"])
            self.compute_cov3D_python = bool(msg["rot_scale_python"])
            keep_alive = bool(msg["keep_alive"])
            scaling_modifier = msg["scaling_modifier"]
            # transposed storage + Y/Z flips (network_gui.py:79-82), then
            # transpose into our column-vector convention
            wvt = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
            wvt[:, 1] = -wvt[:, 1]
            wvt[:, 2] = -wvt[:, 2]
            vpt = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
            vpt[:, 1] = -vpt[:, 1]
            cam = cameras.camera_from_matrices(
                wvt.T, vpt.T, fovx, fovy, width, height, znear, zfar
            )
        except Exception as e:
            traceback.print_exc()
            raise e
        return cam, do_training, keep_alive, scaling_modifier

    def poll(self, ts, raster_cfg, render_fn=None, iterations: int | None = None):
        """Per-iteration service loop (train.py:60-74).

        ``ts`` is the TrainState; renders use its current Gaussian state.
        Returns once the viewer releases training (or no client is connected).
        """
        import jax.numpy as jnp

        from gs_tpu.renderer import render as _render

        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                net_image_bytes = None
                cam, do_training, keep_alive, scaling_mod = self.receive()
                if cam is not None:
                    out = _render(
                        cam, ts.state, active_sh_degree=ts.active_sh_degree,
                        bg_color=jnp.zeros(3), scaling_modifier=scaling_mod,
                        convert_shs_python=self.convert_SHs_python,
                        compute_cov3d_python=self.compute_cov3D_python,
                        cfg=raster_cfg,
                    )
                    img = np.asarray(jnp.clip(out.image, 0.0, 1.0) * 255.0)
                    net_image_bytes = memoryview(
                        img.astype(np.uint8).transpose(1, 2, 0).copy()
                    )
                self.send(net_image_bytes, self.source_path)
                done = iterations is not None and ts.iteration >= iterations
                if do_training and (not done or not keep_alive):
                    break
            except Exception:
                self.conn = None

    def close(self):
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
