"""TCP streaming render server — the `render_server` binary equivalent.

Reference parity: src/render_server.cu:41-108, wire protocol preserved
bit-for-bit:
  request:  exactly 64 bytes = 16 float32, row-major 4x4 camera-to-world
            pose in "nerf" convention (converted on the server by
            nerf_matrix_to_ngp, render_utils.h:68-77)
  response: W*H*3 raw RGB24 bytes, no header
Defaults match the reference: port 12345 (argv[1] overrides), 1080x1080,
Camera{840, 840, 339, 590} (render_server.cu:45-57).

Usage:
  python -m nerf_tpu.apps.render_server [port] --snapshot scene.msgpack
"""
from __future__ import annotations

import argparse
import socket
import sys

import numpy as np

from nerf_tpu.core.types import Camera, RenderSettings
from nerf_tpu.render.engine import NerfRender

POSE_BYTES = 64  # 16 float32 (render_server.cu:92-99)


def recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return buf
        buf += chunk
    return buf


def serve(engine: NerfRender, cam: Camera, port: int, w: int, h: int,
          max_connections: int = -1) -> None:
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("0.0.0.0", port))
    srv.listen(4)
    print(f"[render_server] listening on :{port} ({w}x{h})", flush=True)

    served = 0
    while max_connections < 0 or served < max_connections:
        conn, addr = srv.accept()
        served += 1
        print(f"[render_server] connection from {addr}", flush=True)
        try:
            while True:
                data = recv_exact(conn, POSE_BYTES)
                if len(data) < POSE_BYTES:
                    break
                pose = np.frombuffer(data, "<f4").reshape(4, 4)
                img = engine.render_frame(cam, pose)
                conn.sendall(img.rgb.tobytes())  # H*W*3 raw RGB24
        except (ConnectionResetError, BrokenPipeError) as e:
            print(f"[render_server] client error: {e}", flush=True)
        finally:
            conn.close()
    srv.close()


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    # reference: port is argv[1] (render_server.cu:47-55)
    port = 12345
    if argv and argv[0].isdigit():
        port = int(argv.pop(0))

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--port", type=int, default=port)
    p.add_argument("--width", type=int, default=1080)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--fl-x", type=float, default=840.0)
    p.add_argument("--fl-y", type=float, default=840.0)
    p.add_argument("--cx", type=float, default=339.0)
    p.add_argument("--cy", type=float, default=590.0)
    p.add_argument("--density-scale", type=float, default=1.0)
    p.add_argument("--n-shards", type=int, default=0)
    p.add_argument("--max-connections", type=int, default=-1,
                   help="exit after N connections (testing)")
    p.add_argument("--calibrate", action="store_true",
                   help="render one frame at startup and print Mray/s "
                        "(detects a slow-binary compile; see BASELINE.md)")
    args = p.parse_args(argv)

    mesh = None
    if args.n_shards:
        from nerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.n_shards)
    engine = NerfRender(settings=RenderSettings(
        density_scale=args.density_scale), mesh=mesh)
    engine.reload_network_from_file(args.snapshot)
    engine.set_resolution((args.width, args.height))
    cam = Camera(fl_x=args.fl_x, fl_y=args.fl_y, cx=args.cx, cy=args.cy)
    if args.calibrate:
        import time as _time

        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 6.0
        engine.render_frame(cam, pose)  # compile
        t0 = _time.perf_counter()
        engine.render_frame(cam, pose)
        dt = _time.perf_counter() - t0
        print(f"[render_server] calibration: {dt * 1000:.1f} ms/frame "
              f"({args.width * args.height / dt / 1e6:.2f} Mray/s)",
              flush=True)
    serve(engine, cam, args.port, args.width, args.height,
          args.max_connections)


if __name__ == "__main__":
    main()
