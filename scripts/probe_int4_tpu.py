"""Probe: do int4 operands work inside pallas_call on this jax/TPU stack?

Round-3 ROADMAP recorded int4 as BLOCKED (trace-time RecursionError, probed
2026-08-17); round-3 VERDICT item 8 asks for a re-probe whenever the stack
moves. Interpret mode on CPU now traces int4 fine (2026-08-20), so the live
question is Mosaic TPU lowering. This probe compiles and runs two shapes of
the question:

  1. an int4 VMEM operand widened to bf16 and fed to the MXU (the minimal
     feasibility check), and
  2. an int4x2-packed byte operand unpacked in-kernel via shifts (the
     fallback packing the render kernel would actually use for weights).

Prints one verdict line per leg; exits 0 if at least one viable int4 path
compiles and matches a reference matmul, 1 if all fail. Run ONLY when the
TPU is otherwise idle (single-client tunnel).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _leg_int4_operand():
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[...].astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot(
            a, b_ref[...], preferred_element_type=jnp.float32
        )

    a8 = np.random.randint(-8, 8, size=(128, 128)).astype(np.int8)
    a = jnp.asarray(a8).astype(jnp.int4)
    b = jnp.asarray(np.random.randn(128, 128).astype(np.float32)).astype(
        jnp.bfloat16
    )
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)
    )(a, b)
    ref = a8.astype(np.float32) @ np.asarray(b, dtype=np.float32)
    err = float(np.max(np.abs(np.asarray(out) - ref))) / (
        float(np.max(np.abs(ref))) + 1e-9
    )
    return err


def _leg_packed_bytes():
    # Two int4 values per uint8: low nibble = even row, high nibble = odd.
    w4 = np.random.randint(-8, 8, size=(128, 128)).astype(np.int8)
    packed = ((w4[0::2] & 0xF) | ((w4[1::2] & 0xF) << 4)).astype(np.uint8)

    def kern(p_ref, b_ref, o_ref):
        p = p_ref[...]
        lo = (p & 0xF).astype(jnp.int8)
        lo = jnp.where(lo >= 8, lo - 16, lo)
        hi = (p >> 4).astype(jnp.int8)
        hi = jnp.where(hi >= 8, hi - 16, hi)
        # Re-interleave rows: [64,128] + [64,128] -> [128,128].
        w = jnp.stack([lo, hi], axis=1).reshape(128, 128).astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot(
            w, b_ref[...], preferred_element_type=jnp.float32
        )

    b = jnp.asarray(np.random.randn(128, 128).astype(np.float32)).astype(
        jnp.bfloat16
    )
    out = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32)
    )(jnp.asarray(packed), b)
    ref = w4.astype(np.float32) @ np.asarray(b, dtype=np.float32)
    err = float(np.max(np.abs(np.asarray(out) - ref))) / (
        float(np.max(np.abs(ref))) + 1e-9
    )
    return err


def main() -> None:
    print(f"jax {jax.__version__}, device: {jax.devices()[0].device_kind}")
    ok = False
    for name, leg in (
        ("int4-operand", _leg_int4_operand),
        ("int4x2-packed-bytes", _leg_packed_bytes),
    ):
        try:
            err = leg()
            verdict = "OK" if err < 2e-2 else f"WRONG RESULT (rel err {err:.3g})"
            ok = ok or err < 2e-2
            print(f"[{name}] {verdict} (rel err {err:.3g})")
        except RecursionError:
            print(f"[{name}] RecursionError (still blocked at trace time)")
        except Exception as exc:  # noqa: BLE001 — report and move on
            print(f"[{name}] {type(exc).__name__}: {str(exc)[:300]}")
    print("INT4 VIABLE" if ok else "INT4 BLOCKED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
