"""Multi-stream mixing wall sharded over a device mesh.

The scale-out story (SURVEY.md §2.7, BASELINE config 5): N live streams
composited into a grid wall plus an N-way audio mix.  The reference scales
by task parallelism (one pipeline per asset on its own queue); here the
streams become a **batch axis sharded over the mesh** —

* video: each device converts+scales its local shard of streams to wall
  tiles (embarrassingly parallel; zero collectives — stream-to-tile
  assignment is chosen so a device owns whole wall rows, leaving the output
  canvas sharded over its height),
* audio: local saturating mixes fold per device, then one ``psum`` over the
  mesh combines partial sums (the only ICI traffic per tick).

Built with ``shard_map`` over a 1-D ``jax.sharding.Mesh``; works identically
on a real pod slice and on the virtual CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..media.pixel import PixelFormat
from ..ops import golden
from ..ops.uniforms import identity_uniforms


def make_mesh(devices=None, axis: str = "s") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


class MixingWall:
    """Grid composite of ``n_streams`` onto a ``grid x grid`` wall.

    Streams arrive as batched dense y420p planes ``[N, H, W]`` (+ half-res
    chroma) and interleaved s16 audio ``[N, samples]``; the step returns the
    composited wall planes and mixed audio, all device-resident and sharded.
    """

    def __init__(self, mesh: Mesh, *, n_streams: int,
                 stream_size: Tuple[int, int],
                 canvas_size: Tuple[int, int],
                 audio_samples: int = 960, channels: int = 2,
                 axis: str = "s"):
        self.mesh = mesh
        self.axis = axis
        n_dev = mesh.devices.size
        if n_streams % n_dev:
            raise ValueError("n_streams must divide evenly over the mesh")
        grid = int(round(n_streams ** 0.5))
        if grid * grid != n_streams:
            raise ValueError("n_streams must be a perfect square")
        # local_step implements the whole-rows-per-device layout only: a
        # mesh larger than the wall's row count would silently produce a
        # tile column instead of the wall (advisor finding, round 1)
        if n_dev > grid or grid % n_dev:
            raise ValueError("mesh must own whole wall rows: need "
                             f"n_dev <= grid and grid % n_dev == 0 "
                             f"(got n_dev={n_dev}, grid={grid})")
        self.grid = grid
        self.n_streams = n_streams
        self.stream_size = stream_size
        cw, ch = canvas_size
        if cw % grid or ch % grid:
            raise ValueError("canvas must divide into the wall grid")
        if (cw // grid) % 2 or (ch // grid) % 2:
            raise ValueError("wall tiles must have even dims (4:2:0 chroma)")
        self.canvas_size = canvas_size
        self.tile = (cw // grid, ch // grid)  # (w, h)
        self.audio_samples = audio_samples
        self.channels = channels
        self._step = self._build(n_dev)

    # --- device program ---------------------------------------------------
    def _build(self, n_dev: int):
        grid = self.grid
        tw, th = self.tile
        sw, sh = self.stream_size
        local = self.n_streams // n_dev
        rows_per_dev = grid // n_dev

        # default-uniform fast path: every cell is a pure full-coverage
        # scale -> two banded MXU matmuls per plane (ops/matscale.py), no
        # gathers.  Custom per-cell uniforms fall back to the general
        # composite fold.
        from ..ops.matscale import plan_scale, scale_y420p_batch
        self._plan = plan_scale(identity_uniforms(self.stream_size,
                                                  self.tile),
                                self.tile, (sh, sw))

        def scale_one(y, u, v, uni):
            """One stream -> one wall tile, with the stream's own composite
            uniforms (aspect fit / offset / opacity / fill per cell)."""
            target = [jnp.zeros((th, tw), jnp.uint8),
                      jnp.full((th // 2, tw // 2), 128, jnp.uint8),
                      jnp.full((th // 2, tw // 2), 128, jnp.uint8)]
            out = golden.apply_composite(target, PixelFormat.y420p,
                                         [y, u, v], PixelFormat.y420p,
                                         uni, xp=jnp, separable=True)
            return out[0], out[1], out[2]

        def assemble_and_mix(ty, tu, tv, audio, gains):
            # arrange local streams into wall rows: [rows, cols, th, tw]
            cols = local // rows_per_dev
            wall_y = ty.reshape(rows_per_dev, cols, th, tw) \
                .transpose(0, 2, 1, 3).reshape(rows_per_dev * th, cols * tw)
            wall_u = tu.reshape(rows_per_dev, cols, th // 2, tw // 2) \
                .transpose(0, 2, 1, 3).reshape(rows_per_dev * th // 2,
                                               cols * tw // 2)
            wall_v = tv.reshape(rows_per_dev, cols, th // 2, tw // 2) \
                .transpose(0, 2, 1, 3).reshape(rows_per_dev * th // 2,
                                               cols * tw // 2)
            # audio: local gain+sum in f32, then one psum across the mesh
            contrib = jnp.sum(audio.astype(jnp.float32) * gains[:, None],
                              axis=0)
            total = jax.lax.psum(contrib, self.axis)
            mixed = jnp.clip(jnp.trunc(total), -32768, 32767).astype(jnp.int16)
            return wall_y, wall_u, wall_v, mixed

        def local_step(ys, us, vs, audio, gains, unis):
            ty, tu, tv = jax.vmap(scale_one)(ys, us, vs, unis)
            return assemble_and_mix(ty, tu, tv, audio, gains)

        def local_step_plan(ys, us, vs, audio, gains):
            ty, tu, tv = scale_y420p_batch(ys, us, vs, self._plan)
            return assemble_and_mix(ty, tu, tv, audio, gains)

        spec_s = P(self.axis)
        shard = jax.shard_map(
            local_step, mesh=self.mesh,
            in_specs=(spec_s, spec_s, spec_s, spec_s, spec_s, spec_s),
            out_specs=(spec_s, spec_s, spec_s, P()))
        shard_plan = jax.shard_map(
            local_step_plan, mesh=self.mesh,
            in_specs=(spec_s, spec_s, spec_s, spec_s, spec_s),
            out_specs=(spec_s, spec_s, spec_s, P()))
        self._step_plan = jax.jit(shard_plan)
        return jax.jit(shard)

    # --- step -------------------------------------------------------------
    def shard(self, array):
        """Place a [N, ...] host array sharded over the stream axis."""
        return jax.device_put(array, NamedSharding(self.mesh, P(self.axis)))

    def default_uniforms(self):
        """Identity full-cell uniforms for every stream, sharded."""
        uni = identity_uniforms(self.stream_size, self.tile).pack()
        return self.shard(jnp.broadcast_to(jnp.asarray(uni),
                                           (self.n_streams, uni.shape[0])))

    def step(self, ys, us, vs, audio, gains=None, uniforms=None):
        """One wall tick.  ys/us/vs: [N, ...] u8 planes; audio: [N, samples]
        s16; gains: [N] f32; uniforms: optional [N, UNIFORM_WIDTH] per-cell
        composite uniforms.  Returns (wall_y, wall_u, wall_v, mixed).

        Without custom uniforms, cells run the matmul-sampler fast path
        (ops/matscale.py); per-cell uniforms use the general composite."""
        if gains is None:
            gains = jnp.ones((self.n_streams,), jnp.float32)
        if uniforms is None and self._plan is not None:
            return self._step_plan(ys, us, vs, audio, gains)
        if uniforms is None:
            uniforms = self.default_uniforms()
        return self._step(ys, us, vs, audio, gains, uniforms)
