"""Native C++ render server: wire-protocol parity over a real socket.

Covers nerf_tpu/native/render_server.cpp + apps/render_worker.py against
the reference protocol (src/render_server.cu:92-102): 64-byte row-major
pose in, W*H*3 raw RGB24 out, multiple requests per connection.
"""
import os
import shutil
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "nerf_tpu",
                          "native")

SMALL_CFG = {
    "encoding": {"otype": "HashGrid", "n_levels": 4,
                 "n_features_per_level": 2, "log2_hashmap_size": 12,
                 "base_resolution": 16},
    "network": {"otype": "CutlassMLP", "activation": "ReLU",
                "output_activation": "None", "n_neurons": 16,
                "n_hidden_layers": 1},
    "dir_encoding": {"otype": "SphericalHarmonics", "degree": 2},
    "rgb_network": {"otype": "CutlassMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": 16,
                    "n_hidden_layers": 1},
}


def _recv_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            break
        buf += chunk
    return buf


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_native_server_roundtrip(tmp_path):
    binary = os.path.join(NATIVE_DIR, "render_server_native")
    subprocess.run(["bash", os.path.join(NATIVE_DIR, "build_native.sh")],
                   check=True, capture_output=True, timeout=180)
    assert os.path.exists(binary)

    from nerf_tpu.core.snapshot import make_synthetic_snapshot, save_snapshot
    from nerf_tpu.core.types import Camera, RenderSettings
    from nerf_tpu.render.engine import NerfRender

    snap = make_synthetic_snapshot(seed=3, grid_h=16,
                                   network_config=SMALL_CFG)
    snap_path = str(tmp_path / "scene.msgpack")
    save_snapshot(snap_path, snap.config, snap.params, snap.density_grid,
                  snap.settings)

    w = h = 12
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 6.0
    cam = Camera(fl_x=20.0, fl_y=20.0, cx=6.0, cy=6.0)

    # expected frame straight from the engine
    eng = NerfRender(settings=RenderSettings(density_scale=8.0))
    eng.load_from_snapshot(snap)
    eng.set_resolution((w, h))
    expected = eng.render_frame(cam, pose).rgb.tobytes()

    port = 23817
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # this box's sitecustomize registers the TPU backend whenever this is
    # set, and then JAX_PLATFORMS=cpu is ignored — scrub it so the worker
    # really runs on CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [binary, str(port), "--max-connections", "1", "--",
         sys.executable, "-m", "nerf_tpu.apps.render_worker",
         "--snapshot", snap_path, "--width", str(w), "--height", str(h),
         "--fl-x", "20", "--fl-y", "20", "--cx", "6", "--cy", "6",
         "--density-scale", "8.0"],
        env=env, stderr=subprocess.PIPE)
    try:
        deadline = time.time() + 300
        sock = None
        while time.time() < deadline:
            try:
                sock = socket.create_connection(("127.0.0.1", port),
                                                timeout=2)
                break
            except OSError:
                if proc.poll() is not None:
                    raise AssertionError(
                        f"server died: {proc.stderr.read().decode()}")
                time.sleep(1)
        assert sock is not None, "could not connect"
        sock.settimeout(600)  # first frame pays the CPU jit compile
        with sock:
            frames = []
            for _ in range(2):  # two requests on one connection
                sock.sendall(pose.tobytes())
                frame = _recv_exact(sock, w * h * 3)
                assert len(frame) == w * h * 3
                frames.append(np.frombuffer(frame, np.uint8))
            # same pose twice -> identical frames from the worker
            np.testing.assert_array_equal(frames[0], frames[1])
            # vs the in-process engine: allow 1 u8 step (XLA CPU
            # reduction order varies with the host's thread count)
            exp = np.frombuffer(expected, np.uint8).astype(np.int16)
            got = frames[0].astype(np.int16)
            assert np.max(np.abs(exp - got)) <= 1, np.max(np.abs(exp - got))
        proc.wait(timeout=60)  # --max-connections 1 -> clean exit
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()
