"""Probe: does Mosaic support the int4 nibble-unpack chain, and how fast?

De-risks ops/talker_step_q4.py before building it. Three questions:
  1. compile: uint8 `&`/`>>`, astype->bf16, and the group-scale broadcast
     (G,ot)->(G,1,ot)->(G*128? no: (ng,128,ot)).reshape merge — do they
     lower at all?
  2. parity: unpacked matmul == reference dequant matmul.
  3. rate: ms per simulated "layer" of tiles (VPU unpack vs the DMA floor).

Run on TPU: python examples/bench_pallas_unpack.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, HALF, OUT, G128 = 8, 1024, 3072, 128  # one gu-like packed tile
NG2 = HALF // G128                       # groups per half
REPS = 64                                # unpack+dot repetitions per dispatch


def _kernel(h_ref, q_ref, s_ref, o_ref, *, reps: int, group_mode: str):
    h = h_ref[:]                        # (B, 2*HALF) bf16
    acc = jnp.zeros((B, OUT), jnp.float32)
    for r in range(reps):
        tile = q_ref[:]                 # (HALF, OUT) int8 (bitcast container)
        # Mosaic has neither uint8 casts nor int8 shifts: lo is the biased
        # nibble; hi is stored SIGNED and extracted shift-free.
        lo_bits = tile & jnp.int8(0x0F)
        lo_u = lo_bits.astype(jnp.bfloat16) - jnp.bfloat16(8)
        hi_u = ((tile.astype(jnp.bfloat16) - lo_bits.astype(jnp.bfloat16))
                * jnp.bfloat16(0.0625))
        sf = s_ref[:].astype(jnp.bfloat16)      # (2*NG2, OUT)
        if group_mode == "plain8":              # baseline: int8 weights as-is
            acc = acc + jax.lax.dot_general(
                h[:, :HALF], tile.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            h = jnp.concatenate(
                [acc[:, :HALF] * jnp.float32(1e-6) + h[:, :HALF].astype(jnp.float32),
                 h[:, HALF:].astype(jnp.float32)], axis=-1).astype(jnp.bfloat16)
            continue
        for part, h0, g0 in ((lo_u, 0, 0), (hi_u, HALF, NG2)):
            if group_mode == "unpack_only":
                acc = acc + jax.lax.dot_general(
                    h[:, h0:h0 + HALF], part, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif group_mode == "rowscale":
                w = part * sf[g0:g0 + 1]
                acc = acc + jax.lax.dot_general(
                    h[:, h0:h0 + HALF], w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif group_mode == "expand":
                s_t = sf[g0:g0 + NG2]           # (NG2, OUT)
                s_e = jnp.broadcast_to(s_t[:, None, :], (NG2, G128, OUT))
                s_e = s_e.reshape(HALF, OUT)
                w = part * s_e
                acc = acc + jax.lax.dot_general(
                    h[:, h0:h0 + HALF], w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:  # per-group dots
                for j in range(NG2):
                    w = part[j * G128:(j + 1) * G128]
                    d = jax.lax.dot_general(
                        h[:, h0 + j * G128:h0 + (j + 1) * G128], w,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + d * sf[g0 + j][None, :]
        h = jnp.concatenate(
            [acc[:, :HALF] * jnp.float32(1e-6) + h[:, :HALF].astype(jnp.float32),
             h[:, HALF:].astype(jnp.float32)], axis=-1).astype(jnp.bfloat16)
    o_ref[:] = acc


def run_mode(group_mode: str):
    key = jax.random.PRNGKey(0)
    kq, ks, kh = jax.random.split(key, 3)
    q = jax.lax.bitcast_convert_type(
        jax.random.randint(kq, (HALF, OUT), 0, 255, jnp.int32).astype(jnp.uint8),
        jnp.int8)
    s = (jax.random.uniform(ks, (2 * NG2, OUT)) * 0.02 + 0.001).astype(jnp.bfloat16)
    h = jax.random.normal(kh, (B, 2 * HALF), jnp.bfloat16)

    fn = pl.pallas_call(
        functools.partial(_kernel, reps=REPS, group_mode=group_mode),
        out_shape=jax.ShapeDtypeStruct((B, OUT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(fn)
    t0 = time.time()
    out = jfn(h, q, s)
    out.block_until_ready()
    np.asarray(out)
    compile_s = time.time() - t0

    # parity vs reference dequant (single rep semantics: check rep 0 portion
    # by rerunning with reps=1)
    fn1 = jax.jit(pl.pallas_call(
        functools.partial(_kernel, reps=1, group_mode=group_mode),
        out_shape=jax.ShapeDtypeStruct((B, OUT), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
    got = np.asarray(fn1(h, q, s))
    qu = np.asarray(q).view(np.uint8)
    lo = (qu & 0x0F).astype(np.float32) - 8
    hi = np.asarray(q).view(np.int8).astype(np.int32) >> 4  # signed nibble
    hi = hi.astype(np.float32)
    sf = np.asarray(s, np.float32)
    se = np.repeat(sf, G128, axis=0)
    w = np.concatenate([lo, hi], axis=0) * se
    hf = np.asarray(h, np.float32)
    want = hf @ w.astype(np.float32)
    err = (np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
           if group_mode == "expand" else float("nan"))

    dts = []
    for i in (1, 2, 3):
        h2 = h + jnp.bfloat16(i * 1e-3)
        t0 = time.perf_counter()
        np.asarray(jfn(h2, q, s))
        dts.append(time.perf_counter() - t0)
    per_tile_ms = min(dts) / REPS * 1e3
    mb = HALF * OUT / 1e6
    print(f"  mode={group_mode:7s} compile={compile_s:6.1f}s  rel_err={err:.2e}  "
          f"{per_tile_ms:7.4f} ms/tile ({mb:.1f} MB packed; DMA floor "
          f"{mb / 350 / 1e3 * 1e3:.4f} ms)", flush=True)


if __name__ == "__main__":
    print(f"device={jax.devices()[0]}", flush=True)
    for mode in ("plain8", "unpack_only", "rowscale", "expand"):
        try:
            run_mode(mode)
        except Exception as e:
            print(f"  mode={mode} FAILED: {type(e).__name__}: "
                  f"{str(e)[:4000]}", flush=True)
