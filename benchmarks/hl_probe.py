"""Quick headline probe: config-3 prepad tick, parity + slope timing.

Used to A/B kernel formulation changes on hardware inside one contention
window (run, edit swiftvideo_tpu/ops/pallas_frame.py, run again).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_loop(body, init, iters=100, reps=6):
    @jax.jit
    def run(carry, n):
        return jax.lax.fori_loop(0, n, body, carry)

    def wall(n):
        t0 = time.perf_counter()
        out = run(init, n)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
        return time.perf_counter() - t0

    wall(2)
    n1, n2 = iters // 5, iters
    t1s, t2s = [], []
    for _ in range(reps):
        t1s.append(wall(n1))
        t2s.append(wall(n2))
    slopes = [(b - a) / (n2 - n1) for a, b in zip(t1s, t2s) if b > a]
    best = (min(t2s) - min(t1s)) / (n2 - n1) if min(t2s) > min(t1s) \
        else min(slopes)
    log("  rep slopes (ms):",
        ["%.3f" % (s * 1e3) for s in slopes],
        "min-t %.4f" % (best * 1e3))
    return best


def main():
    from swiftvideo_tpu.media.pixel import PixelFormat
    from swiftvideo_tpu.ops import golden, rect_uniforms
    from swiftvideo_tpu.ops.pallas_frame import (
        _pad_runner, _runner_A_pre, composite_frame_pallas, frame_geometry)

    log("devices:", jax.devices())
    rng = np.random.default_rng(0)
    H, W = 1080, 1920
    n = 4
    sources, unis = [], []
    for s in range(n):
        sources.append([
            rng.integers(0, 256, (H, W), np.int64).astype(np.uint8),
            rng.integers(0, 256, (H // 2, W // 2), np.int64).astype(np.uint8),
            rng.integers(0, 256, (H // 2, W // 2), np.int64).astype(np.uint8)])
        unis.append(rect_uniforms((W, H), (W, H), x=(s % 2) * 960,
                                  y=(s // 2) * 540, w=960, h=540,
                                  opacity=0.9, fill_color=(0.1, 0.2, 0.3, 0.5)
                                  ).pack())
    srcs3 = [(sources[i], PixelFormat.y420p, unis[i]) for i in range(n)]
    ref = golden.composite_stack(PixelFormat.y420p, (W, H), srcs3)
    geom = frame_geometry(unis, (W, H), (H, W))
    ys4 = jnp.stack([jnp.asarray(p[0]) for p in sources])
    us4 = jnp.stack([jnp.asarray(p[1]) for p in sources])
    vs4 = jnp.stack([jnp.asarray(p[2]) for p in sources])
    geom_sig = (geom["hp"], geom["wp"], geom["hpc"], geom["wpc"],
                geom["padt"], tuple(geom["pgrps"]), geom["has1"])
    arrs = _pad_runner(*geom_sig)(ys4, us4, vs4)
    packed_a = jnp.asarray(np.stack([np.asarray(u, np.float32)
                                     for u in unis]))
    offs_a = np.asarray(geom["offs"], np.int32)
    jr_a = np.asarray(geom["jranges"], np.int32)

    # A/B: build the prelerp and folded-weights programs and time them
    # INTERLEAVED so both see the same contention regime
    from swiftvideo_tpu.ops.pallas_frame import _frame_program, frame_params

    def make_run(prelerp):
        prog = _frame_program(H, W, H, W, n, geom["bh"], geom["bw"],
                              geom["hp"], geom["wp"], geom["hpc"],
                              geom["wpc"], tuple(geom["pgrps"]),
                              geom["has1"], geom["ww"], False, False,
                              prelerp)

        @jax.jit
        def run(pk, jr, *a):
            ip, fp = frame_params(pk, jnp.asarray(offs_a),
                                  jr, (W, H), (H, W),
                                  geom["pys"], geom["padt"])
            return prog(ip, fp, *a)

        return run

    variants = {"prelerp": make_run(True), "folded": make_run(False)}
    for name, run in variants.items():
        out_v = run(packed_a, jnp.asarray(jr_a), *arrs)
        err_v = max(int(np.abs(np.asarray(o).astype(int)
                               - r.astype(int)).max())
                    for o, r in zip(out_v, ref))
        log(f"{name}: parity err {err_v}")
        assert err_v <= 1, (name, err_v)

    def make_body(run, jr):
        jrj = jnp.asarray(jr)

        def body(_k, carry):
            pk, _o = carry
            o2 = run(pk, jrj, *arrs)
            return (pk + o2[0][0, 0].astype(jnp.float32) * 1e-12, o2)
        return body

    # stage split: zeroed jranges skip every column tile (same compiled
    # program, different scalar data) => rows+lerp cost alone
    jr_none = np.zeros_like(jr_a)
    jobs = [(name, run, jr_a) for name, run in variants.items()]
    jobs.append(("prelerp-notiles", variants["prelerp"], jr_none))
    results = {name: [] for name, _, _ in jobs}
    for trial in range(int(os.environ.get("HL_TRIALS", "3"))):
        for name, run, jr in jobs:
            dt = device_loop(make_body(run, jr),
                             (packed_a, run(packed_a, jnp.asarray(jr),
                                            *arrs)))
            results[name].append(dt)
            log(f"trial {trial} {name}: {dt*1e3:.4f} ms = {1/dt:.1f} fps")
    for name, ds in results.items():
        log(f"== {name}: min {min(ds)*1e3:.4f} ms = {1/min(ds):.1f} fps")


if __name__ == "__main__":
    main()
