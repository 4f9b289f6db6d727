"""Viewer server wire-protocol test over a loopback socket."""

import json
import socket
import threading

import numpy as np

from sdpgs_tpu.viewer import GuiServer


def test_gui_roundtrip():
    server = GuiServer(port=0)  # ephemeral port
    host, port = server.listener.getsockname()

    W, H = 32, 24
    view = np.eye(4, dtype=np.float32)
    msg = {
        "resolution_x": W, "resolution_y": H,
        "train": True, "keep_alive": False,
        "scaling_modifier": 1.0, "shs_python": False, "rot_scale_python": False,
        "fov_x": 0.9, "fov_y": 0.7, "z_near": 0.01, "z_far": 100.0,
        # SIBR sends transposed matrices with y/z sign flips
        "view_matrix": view.T.flatten().tolist(),
        "view_projection_matrix": np.eye(4, dtype=np.float32).flatten().tolist(),
    }

    result = {}

    def client():
        c = socket.create_connection((host, port), timeout=5)
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < W * H * 3:
            img += c.recv(W * H * 3 - len(img))
        vlen = int.from_bytes(c.recv(4), "little")
        verify = c.recv(vlen).decode()
        result["img"] = img
        result["verify"] = verify
        c.close()

    t = threading.Thread(target=client)
    t.start()
    # server side: accept, receive, render a flat gray frame, reply
    while not server.try_connect():
        pass
    cam, controls = server.receive()
    assert cam is not None and cam.width == W and cam.height == H
    assert controls["train"] is True
    server.send(np.full((H, W, 3), 0.5, np.float32), "scene")
    t.join(timeout=5)
    assert result["verify"] == "scene"
    assert len(result["img"]) == W * H * 3
    assert result["img"][0] == 127
    server.drop()
