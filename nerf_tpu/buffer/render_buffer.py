"""Frame buffer: spp accumulation, tonemap-to-surface, overlays, colormaps.

Reference parity: `CudaRenderBuffer` (include/nerf-cuda/render_buffer.h:
160-315, src/render_buffer.cu):
  - accumulate_kernel spp averaging with Linear/SRGB/VisPosNeg color
    spaces (render_buffer.cu:224-259)
  - tonemap_kernel: background alpha-blend + tonemap pipeline + optional
    clamp (render_buffer.cu:529-556)
  - overlay_image / overlay_depth / overlay_false_color with the turbo and
    viridis polynomial colormaps (render_buffer.cu:341-527)

TPU design: the "surface" is just an [H, W, 4] fp32 array; every kernel is
a pure whole-image jnp function (XLA fuses them). The CUDA/GL surface
providers (CudaSurface2D/GLTexture, render_buffer.h:32-158) have no TPU
analog — presentation is host-side PNG/raw bytes.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from nerf_tpu.buffer.tonemap import linear_to_srgb, srgb_to_linear, tonemap


def colormap_turbo(x):
    """render_buffer.cu:413-429."""
    x = jnp.clip(x, 0.0, 1.0)
    v4 = jnp.stack([jnp.ones_like(x), x, x * x, x * x * x], -1)
    v2 = jnp.stack([v4[..., 3] * x, v4[..., 3] * v4[..., 2]], -1)
    red4 = jnp.asarray([0.13572138, 4.61539260, -42.66032258, 132.13108234])
    green4 = jnp.asarray([0.09140261, 2.19418839, 4.84296658, -14.18503333])
    blue4 = jnp.asarray([0.10667330, 12.64194608, -60.58204836, 110.36276771])
    red2 = jnp.asarray([-152.94239396, 59.28637943])
    green2 = jnp.asarray([4.27729857, 2.82956604])
    blue2 = jnp.asarray([-89.90310912, 27.34824973])
    return jnp.stack([
        v4 @ red4 + v2 @ red2,
        v4 @ green4 + v2 @ green2,
        v4 @ blue4 + v2 @ blue2,
    ], -1)


def colormap_viridis(x):
    """render_buffer.cu:479-489."""
    x = jnp.clip(x, 0.0, 1.0)[..., None]
    c0 = jnp.asarray([0.2777273272234177, 0.005407344544966578,
                      0.3340998053353061])
    c1 = jnp.asarray([0.1050930431085774, 1.404613529898575,
                      1.384590162594685])
    c2 = jnp.asarray([-0.3308618287255563, 0.214847559468213,
                      0.09509516302823659])
    c3 = jnp.asarray([-4.634230498983486, -5.799100973351585,
                      -19.33244095627987])
    c4 = jnp.asarray([6.228269936347081, 14.17993336680509,
                      56.69055260068105])
    c5 = jnp.asarray([4.776384997670288, -13.74514537774601,
                      -65.35303263337234])
    c6 = jnp.asarray([-5.435455855934631, 4.645852612178535,
                      26.3124352495832])
    return c0 + x * (c1 + x * (c2 + x * (c3 + x * (c4 + x * (c5 + x * c6)))))


def accumulate(frame, accum, sample_count: int | jnp.ndarray,
               color_space: str = "Linear"):
    """Running spp average (render_buffer.cu:224-259).

    frame, accum: [H, W, 4]; returns the new accumulate buffer.
    """
    n = jnp.asarray(sample_count, jnp.float32)
    color = frame
    if color_space == "VisPosNeg":
        val = color[..., 0] - color[..., 1]
        tmp_val = accum[..., 0] - accum[..., 1]
        tmp_val = (tmp_val * n + val) / (n + 1)
        new_rgb = jnp.stack([jnp.maximum(tmp_val, 0.0),
                             jnp.maximum(-tmp_val, 0.0),
                             accum[..., 2]], -1)
    else:
        rgb = color[..., :3]
        if color_space == "SRGB":
            rgb = linear_to_srgb(rgb)
        new_rgb = (accum[..., :3] * n + rgb) / (n + 1)
    new_a = (accum[..., 3] * n + color[..., 3]) / (n + 1)
    return jnp.concatenate([new_rgb, new_a[..., None]], -1)


class RenderBuffer:
    """Stateful façade (host-side) over the pure buffer ops."""

    def __init__(self, resolution: Tuple[int, int],
                 color_space: str = "Linear",
                 tonemap_curve: str = "Identity",
                 output_color_space: str = "Linear"):
        self.resolution = (int(resolution[0]), int(resolution[1]))
        self.color_space = color_space
        self.tonemap_curve = tonemap_curve
        self.output_color_space = output_color_space
        self.spp = 0
        w, h = self.resolution
        self.accum = jnp.zeros((h, w, 4), jnp.float32)
        self.surface = jnp.zeros((h, w, 4), jnp.float32)
        self.depth_buffer = jnp.zeros((h, w), jnp.float32)

    def resize(self, resolution: Tuple[int, int]) -> None:
        self.__init__(resolution, self.color_space, self.tonemap_curve,
                      self.output_color_space)

    def clear_frame(self) -> None:
        """render_buffer.cu:590-593 (reset_accumulation + clears)."""
        w, h = self.resolution
        self.accum = jnp.zeros((h, w, 4), jnp.float32)
        self.surface = jnp.zeros((h, w, 4), jnp.float32)
        self.spp = 0

    def accumulate_frame(self, frame) -> None:
        """Accumulate one [H, W, 4] sample frame (render_buffer.cu:595-615)."""
        self.accum = accumulate(frame, self.accum, self.spp,
                                self.color_space)
        self.spp += 1

    def set_depth(self, depth) -> None:
        self.depth_buffer = jnp.asarray(depth, jnp.float32)

    def tonemap_to_surface(self, exposure: float = 0.0,
                           background_color=(0.0, 0.0, 0.0, 0.0),
                           clamp_output_color: bool = False):
        """tonemap_kernel (render_buffer.cu:529-556): alpha-blend the
        background (sRGB-specified) then run the tonemap pipeline."""
        bg = jnp.asarray(background_color, jnp.float32)
        color = self.accum
        bg_rgb = bg[:3]
        if self.color_space != "SRGB":
            bg_rgb = srgb_to_linear(bg_rgb)
        weight = (1.0 - color[..., 3]) * bg[3]
        rgb = color[..., :3] + bg_rgb * weight[..., None]
        a = color[..., 3] + weight
        rgb = tonemap(rgb, exposure, self.tonemap_curve, self.color_space,
                      self.output_color_space)
        if clamp_output_color:
            rgb = jnp.clip(rgb, 0.0, 1.0)
        self.surface = jnp.concatenate([rgb, a[..., None]], -1)
        return self.surface

    # -- overlays (GUI-path parity, render_buffer.cu:341-527) -------------
    def overlay_image(self, image, alpha: float = 1.0, exposure: float = 0.0,
                      background_color=(0.0, 0.0, 0.0, 0.0)) -> None:
        """Blend an [H, W, 4] linear image over the surface (same-resolution
        fast path of overlay_image_kernel)."""
        img = jnp.asarray(image, jnp.float32)
        bg = jnp.asarray(background_color, jnp.float32)
        bg_rgb = bg[:3]
        if self.color_space != "SRGB":
            bg_rgb = srgb_to_linear(bg_rgb)
        weight = (1.0 - img[..., 3]) * bg[3]
        rgb = img[..., :3] + bg_rgb * weight[..., None]
        a = img[..., 3] + weight
        rgb = tonemap(rgb, exposure, self.tonemap_curve, self.color_space,
                      self.output_color_space)
        new = jnp.concatenate([rgb, a[..., None]], -1)
        self.surface = new * alpha + self.surface * (1.0 - alpha)

    def overlay_depth(self, depth, alpha: float = 1.0,
                      depth_scale: float = 1.0) -> None:
        """Turbo-colormapped depth overlay (render_buffer.cu:431-477)."""
        c = colormap_turbo(jnp.asarray(depth, jnp.float32) * depth_scale)
        new = jnp.concatenate([c, jnp.ones_like(c[..., :1])], -1)
        self.surface = new * alpha + self.surface * (1.0 - alpha)

    def overlay_false_color(self, error_map, average: float,
                            brightness: float = 1.0,
                            viridis: bool = True) -> None:
        """Error-map overlay modulating surface luminance
        (render_buffer.cu:491-527)."""
        err = jnp.asarray(error_map, jnp.float32) \
            * (brightness / (1e-7 + average))
        if viridis:
            err = err / (1.0 + err)
        c = colormap_viridis(err) if viridis else colormap_turbo(err)
        grey = (self.surface[..., 0] * 0.2126 + self.surface[..., 1] * 0.7152
                + self.surface[..., 2] * 0.0722)
        rgb = grey[..., None] * jnp.clip(c, 0.0, 1.0)
        self.surface = jnp.concatenate([rgb, self.surface[..., 3:]], -1)
