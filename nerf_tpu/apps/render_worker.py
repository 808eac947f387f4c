"""Render worker: the device-owning half of the native render server.

nerf_tpu/native/render_server.cpp owns the TCP socket layer (the role
sockpp plays in the reference, src/render_server.cu:41-108) and drives
this process over pipes:
  stdout: one "READY <W> <H>\\n" line after the engine is loaded,
  then a loop of { stdin: 64 bytes = 16 float32 row-major pose ->
  stdout: W*H*3 raw RGB24 } — the reference wire protocol verbatim
  (render_server.cu:92-102).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from nerf_tpu.core.types import Camera, RenderSettings
from nerf_tpu.render.engine import NerfRender

POSE_BYTES = 64


def _claim_wire_fd():
    """Isolate the binary frame channel from Python-level stdout.

    The wire protocol shares fd 1 with anything that prints (JAX/absl
    warnings, stray library prints) — one interleaved line desyncs the
    native server's read_exact framing. dup() the real stdout fd for
    frame writes and rebind sys.stdout to stderr so later prints are
    harmless (ADVICE r2)."""
    import os

    wire = os.fdopen(os.dup(sys.stdout.fileno()), "wb", buffering=0)
    sys.stdout.flush()
    os.dup2(sys.stderr.fileno(), sys.stdout.fileno())
    sys.stdout = sys.stderr
    return wire


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot", required=True)
    p.add_argument("--width", type=int, default=1080)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--fl-x", type=float, default=840.0)
    p.add_argument("--fl-y", type=float, default=840.0)
    p.add_argument("--cx", type=float, default=339.0)
    p.add_argument("--cy", type=float, default=590.0)
    p.add_argument("--density-scale", type=float, default=1.0)
    p.add_argument("--n-shards", type=int, default=0)
    p.add_argument("--host-loop", action="store_true")
    args = p.parse_args(argv)

    wire = _claim_wire_fd()
    mesh = None
    if args.n_shards:
        from nerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.n_shards)
    engine = NerfRender(settings=RenderSettings(
        density_scale=args.density_scale, host_loop=args.host_loop),
        mesh=mesh)
    engine.reload_network_from_file(args.snapshot)
    engine.set_resolution((args.width, args.height))
    cam = Camera(fl_x=args.fl_x, fl_y=args.fl_y, cx=args.cx, cy=args.cy)

    wire.write(f"READY {args.width} {args.height}\n".encode())
    stdin = sys.stdin.buffer
    while True:
        data = stdin.read(POSE_BYTES)
        if data is None or len(data) < POSE_BYTES:
            break
        pose = np.frombuffer(data, "<f4").reshape(4, 4)
        img = engine.render_frame(cam, pose)
        wire.write(img.rgb.tobytes())


if __name__ == "__main__":
    main()
