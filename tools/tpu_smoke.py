"""On-device smoke: run the compiled (non-interpret) Pallas kernels and the
int8 inference path on the real TPU and compare against jnp references.

The pytest suite pins CPU (interpret mode); this script is the hardware
counterpart, run manually or by bench infrastructure:

    python tools/tpu_smoke.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from alignq_tpu.kernels.qmatmul import (
        int8_matmul_dequant,
        int8_matmul_dequant_reference,
    )
    from alignq_tpu.kernels.quantize import (
        cdf_quantize_int8,
        cdf_quantize_int8_reference,
    )
    from alignq_tpu.kernels.infer import build_resnet20_int8

    print("devices:", jax.devices())
    failures = 0

    x = jax.random.normal(jax.random.PRNGKey(0), (1024, 256)) * 1.5
    got = np.asarray(cdf_quantize_int8(x)).astype(np.int32)
    want = np.asarray(cdf_quantize_int8_reference(x)).astype(np.int32)
    diff = np.abs(got - want)
    frac = (diff > 0).mean()
    print(f"quantize kernel: max unit diff {diff.max()}, flip frac {frac:.2e}")
    if diff.max() > 1 or frac > 1e-3:
        failures += 1

    a = jax.random.randint(jax.random.PRNGKey(1), (512, 384), -127, 128, jnp.int8)
    w = jax.random.randint(jax.random.PRNGKey(2), (384, 256), -127, 128, jnp.int8)
    s = jax.random.uniform(jax.random.PRNGKey(3), (256,)) * 0.01
    b = jax.random.normal(jax.random.PRNGKey(4), (256,))
    got = np.asarray(int8_matmul_dequant(a, w, s, b, relu=True))
    want = np.asarray(int8_matmul_dequant_reference(a, w, s, b, relu=True))
    rel = np.abs(got - want) / (np.abs(want) + 1e-3)
    print(f"qmatmul kernel: max rel diff {rel.max():.2e}")
    if rel.max() > 1e-4:
        failures += 1

    fwd, args = build_resnet20_int8(64)
    out = np.asarray(fwd(*args))
    ok = np.isfinite(out).all()
    print(f"int8 resnet20 forward: shape {out.shape}, finite {ok}")
    if not ok:
        failures += 1

    print("TPU smoke:", "PASS" if failures == 0 else f"FAIL ({failures})")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
