"""Motion estimation demo: recover the motion field of a panning scene.

Runs both search variants on a synthetic translating texture and prints
the dominant motion vector per variant:

* ``metric="sad"`` — the reference-parity path (Metal ``me_fullsearch``
  semantics, kernels.metal:206-267): exact integer SAD, scan-order ties.
* ``metric="ssd"`` — the MXU variant: cross-correlation on the systolic
  array, documented SSD scoring (ops/motion.py module notes).

Run: python examples/motion_demo.py  (CPU-friendly sizes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    from swiftvideo_tpu.ops import motion

    rng = np.random.default_rng(7)
    h, w, shift = 128, 256, 5
    ref = rng.integers(0, 255, (h, w), np.uint8)
    cur = np.roll(ref, (shift, shift), axis=(0, 1))   # camera pans by +5,+5

    for metric in ("sad", "ssd"):
        mvs = np.asarray(motion.me_fullsearch_device(cur, ref, block=16,
                                                     search=64,
                                                     metric=metric))
        # decode the normalized RGBA motion field (r=mvx, b=mvy)
        max_mv = 32
        mvx = (mvs[..., 0].astype(np.float32) / 255.0 - 0.5) * 2 * max_mv
        mvy = (mvs[..., 2].astype(np.float32) / 255.0 - 0.5) * 2 * max_mv
        inner = (slice(2, -2), slice(2, -2))          # clamped-window edges
        print(f"{metric}: dominant mv = "
              f"({np.median(mvx[inner]):+.1f}, {np.median(mvy[inner]):+.1f})"
              f"  [expected (+{shift}.0, +{shift}.0)]  "
              f"field {mvs.shape[1]}x{mvs.shape[0]} blocks")
        assert abs(np.median(mvx[inner]) - shift) < 0.6
        assert abs(np.median(mvy[inner]) - shift) < 0.6
    print("motion demo OK")


if __name__ == "__main__":
    main()
