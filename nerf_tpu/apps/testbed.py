"""Offline render CLI — the `testbed` binary equivalent.

Reference parity: src/main.cu:131-237 — load a msgpack snapshot, render
one frame, write image.png + deep.png, time the render, then run the 2x
upsampler and write its output (dlss.png in the reference; upsampled.png
here). Hardcoded camera/pose/paths of the reference are exposed as flags
with the same defaults (main.cu:148-156).

Usage:
  python -m nerf_tpu.apps.testbed --snapshot scene.msgpack [--width 500]
      [--height 500] [--out image.png] [--depth-out deep.png]
      [--upsampled-out upsampled.png] [--no-upsample]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from nerf_tpu.buffer.render_buffer import RenderBuffer
from nerf_tpu.buffer.upsampler import create_upsampler
from nerf_tpu.core.types import Camera, RenderSettings
from nerf_tpu.render.engine import NerfRender

# main.cu:150-156 hardcoded camera + pose
DEFAULT_CAMERA = Camera(fl_x=1375.52, fl_y=1374.49, cx=554.558, cy=965.268)
DEFAULT_POSE = np.array([
    [0.8926439112861807, 0.08799600283226543, 0.4420900262071262,
     0.7453558593996631],
    [0.4464189982715247, -0.03675452191179031, -0.8940689141475064,
     -1.250693899292212],
    [-0.06242909334769873, 0.995442101386738, -0.07209358850389387,
     0.2018605086650635],
    [0.0, 0.0, 0.0, 1.0],
], np.float32)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--snapshot", required=True,
                   help="msgpack snapshot (ref: freality.msgpack)")
    p.add_argument("--width", type=int, default=500)
    p.add_argument("--height", type=int, default=500)
    p.add_argument("--out", default="image.png")
    p.add_argument("--depth-out", default="deep.png")
    p.add_argument("--upsampled-out", default="upsampled.png")
    p.add_argument("--no-upsample", action="store_true")
    p.add_argument("--frames", type=int, default=1,
                   help="render the frame N times (timing)")
    p.add_argument("--fl-x", type=float, default=DEFAULT_CAMERA.fl_x)
    p.add_argument("--fl-y", type=float, default=DEFAULT_CAMERA.fl_y)
    p.add_argument("--cx", type=float, default=DEFAULT_CAMERA.cx)
    p.add_argument("--cy", type=float, default=DEFAULT_CAMERA.cy)
    p.add_argument("--density-scale", type=float, default=1.0)
    p.add_argument("--n-shards", type=int, default=0,
                   help="ray-shard over N devices (0 = single device)")
    p.add_argument("--spp", type=int, default=0,
                   help="accumulate N jittered samples per pixel")
    p.add_argument("--tonemap", default="Identity",
                   choices=("Identity", "ACES", "Hable", "Reinhard"))
    p.add_argument("--dump-npy", action="store_true",
                   help="dump raw float rgb/depth as .npy "
                        "(ref main.cu:209-236 debug dumps)")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)

    mesh = None
    if args.n_shards:
        from nerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.n_shards)

    eng = NerfRender(settings=RenderSettings(
        density_scale=args.density_scale), mesh=mesh)
    t0 = time.perf_counter()
    eng.reload_network_from_file(args.snapshot)
    print(f"[testbed] snapshot loaded in {time.perf_counter() - t0:.2f}s")

    eng.set_resolution((args.width, args.height))
    cam = Camera(fl_x=args.fl_x, fl_y=args.fl_y, cx=args.cx, cy=args.cy)

    img = None
    for i in range(args.frames):
        t0 = time.perf_counter()
        img = eng.render_frame(cam, DEFAULT_POSE)
        dt = time.perf_counter() - t0
        print(f"[testbed] frame {i}: {dt * 1000:.1f} ms "
              f"({args.width * args.height / dt / 1e6:.2f} Mray/s)")

    from PIL import Image as PILImage

    if args.spp > 0:
        surf = np.asarray(eng.render_frame_spp(
            cam, DEFAULT_POSE, spp=args.spp, tonemap_curve=args.tonemap))
        img_rgb = np.asarray(np.clip(surf[..., :3] * 255.0, 0, 255),
                             np.uint8)
        PILImage.fromarray(img_rgb).save(args.out)
    else:
        PILImage.fromarray(img.rgb).save(args.out)
    PILImage.fromarray(img.depth).save(args.depth_out)
    print(f"[testbed] wrote {args.out}, {args.depth_out}")

    if args.dump_npy:
        from nerf_tpu.utils.npy import save_array_as_numpy

        rgbf, depthf, _ = eng.render_frame_arrays(cam, DEFAULT_POSE)
        save_array_as_numpy("image.npy", np.asarray(rgbf))
        save_array_as_numpy("depth.npy", np.asarray(depthf))
        print("[testbed] wrote image.npy, depth.npy")

    if not args.no_upsample:
        # DLSS branch of main.cu:171-206 — render buffer + 2x upsample.
        rgbf, depthf, _ = eng.render_frame_arrays(cam, DEFAULT_POSE)
        import jax.numpy as jnp

        h, w = args.height, args.width
        frame = jnp.concatenate(
            [jnp.asarray(rgbf).reshape(h, w, 3),
             jnp.ones((h, w, 1), jnp.float32)], -1)
        buf = RenderBuffer((w, h))
        buf.accumulate_frame(frame)
        buf.set_depth(jnp.asarray(depthf).reshape(h, w))
        surface = buf.tonemap_to_surface(clamp_output_color=True)

        ups = create_upsampler((2 * w, 2 * h))
        t0 = time.perf_counter()
        out = ups.run(surface[..., :3], depth=buf.depth_buffer)
        out = np.asarray(np.clip(np.asarray(out) * 255.0, 0, 255),
                         np.uint8)
        print(f"[testbed] upsample 2x: "
              f"{(time.perf_counter() - t0) * 1000:.1f} ms")
        PILImage.fromarray(out).save(args.upsampled_out)
        print(f"[testbed] wrote {args.upsampled_out}")


if __name__ == "__main__":
    main()
