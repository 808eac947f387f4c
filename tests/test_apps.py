"""App-level tests: testbed CLI and the TCP render server wire protocol
(bit-for-bit: 64-byte pose in, W*H*3 raw RGB24 out —
src/render_server.cu:92-102)."""
import socket
import threading

import numpy as np
import pytest

from nerf_tpu.core.snapshot import make_synthetic_snapshot, save_snapshot
from tests.test_render import SMALL_CFG, NERF_POSE


@pytest.fixture(scope="module")
def snapshot_path(tmp_path_factory):
    snap = make_synthetic_snapshot(seed=3, grid_h=32,
                                   network_config=SMALL_CFG)
    path = str(tmp_path_factory.mktemp("snap") / "scene.msgpack")
    save_snapshot(path, snap.config, snap.params, snap.density_grid,
                  snap.settings)
    return path


def test_testbed_cli(snapshot_path, tmp_path, monkeypatch):
    from nerf_tpu.apps import testbed

    monkeypatch.chdir(tmp_path)
    testbed.main([
        "--snapshot", snapshot_path, "--width", "24", "--height", "24",
        "--fl-x", "30", "--fl-y", "30", "--cx", "12", "--cy", "12",
        "--density-scale", "8.0",
    ])
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "image.png"))
    assert img.shape == (24, 24, 3)
    dep = np.asarray(Image.open(tmp_path / "deep.png"))
    assert dep.shape == (24, 24)
    ups = np.asarray(Image.open(tmp_path / "upsampled.png"))
    assert ups.shape == (48, 48, 3)


def test_render_server_wire_protocol(snapshot_path):
    from nerf_tpu.apps import render_server
    from nerf_tpu.core.types import Camera, RenderSettings
    from nerf_tpu.render.engine import NerfRender

    w = h = 16
    eng = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng.reload_network_from_file(snapshot_path)
    eng.set_resolution((w, h))
    cam = Camera(fl_x=20.0, fl_y=20.0, cx=8.0, cy=8.0)

    # pick a free port
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    t = threading.Thread(
        target=render_server.serve,
        args=(eng, cam, port, w, h),
        kwargs={"max_connections": 1},
        daemon=True)
    t.start()

    import time

    deadline = time.time() + 30
    sock = None
    while time.time() < deadline:
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=5)
            break
        except OSError:
            time.sleep(0.2)
    assert sock is not None, "server did not come up"

    # request: 16 float32 row-major nerf-convention pose (64 bytes)
    sock.sendall(NERF_POSE.astype("<f4").tobytes())
    expected = w * h * 3
    buf = b""
    sock.settimeout(120)
    while len(buf) < expected:
        chunk = sock.recv(expected - len(buf))
        if not chunk:
            break
        buf += chunk
    assert len(buf) == expected
    frame = np.frombuffer(buf, np.uint8).reshape(h, w, 3)
    # background corners are white in the synthetic scene
    assert tuple(frame[0, 0]) == (255, 255, 255)

    # second pose over the same connection (streaming loop)
    sock.sendall(NERF_POSE.astype("<f4").tobytes())
    buf2 = b""
    while len(buf2) < expected:
        chunk = sock.recv(expected - len(buf2))
        if not chunk:
            break
        buf2 += chunk
    assert len(buf2) == expected
    sock.close()
    t.join(timeout=30)
