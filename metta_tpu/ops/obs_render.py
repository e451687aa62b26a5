"""Pallas TPU kernel for the token-observation render.

Same math as :mod:`metta_tpu.engine.obs_mm` (one-hot matmul formulation,
byte-identical to the reference renderer — ``bindings/mettagrid_c.cpp:397-563``)
but executed entirely in VMEM: the XLA version materializes every one-hot
operand ([A·S, Hp] row selectors, [A·S, NB] block selectors, [A, S, T] slot
scatters ≈ 10 MB/env/step) to HBM because the MXU can't fuse elementwise
producers; at 4096 envs that is tens of GB of HBM traffic per step and the
render becomes bandwidth-bound. Here each grid step loads ~50 KB (grids +
block table), builds the one-hots on-chip, runs the three GEMMs on the MXU,
and writes only the [3, A, T] uint8 output.

Stages per env (see obs_mm.py for the derivation + exactness argument):
  1. window read      — [A*S, Hp] one-hot @ [Hp, 2*Wp] grid planes
  2. block lookup     — [A*S, NB] one-hot @ [NB, 2K+1] table (counts ride along)
  3. cumsum           — counts @ strict-lower-triangular ones (MXU, f32 exact)
  4. slot scatter     — per-agent [T, S] one-hot @ [S, 3K]
  5. anti-diagonals   — K lane-rolls + masked adds, all agents at once
  6. globals merge + validity mask + uint8 pack — in-kernel

Called per env and vmapped over the batch (pallas_call's batching rule turns
the vmap into a leading grid dimension, so the whole batch pipelines through
one kernel launch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EMPTY = 255


def _obs_kernel(gridcat_ref, comp_ref, ar_ref, ac_ref, gcnt_ref, g3_ref,
                dr_ref, dc_ref, out_ref, *, A, S, T, K, NB, Hp, Wp, Gp,
                off_agent, ohr, owr, exact_bf16):
    f32 = jnp.float32
    gdtype = jnp.bfloat16 if exact_bf16 else f32
    gprec = None if exact_bf16 else jax.lax.Precision.HIGHEST

    dr2 = dr_ref[0]                                      # [S, 1] i32
    dc2 = dc_ref[0]
    gridcat = gridcat_ref[0].astype(gdtype)              # [Hp, 2*Wp]
    comp = comp_ref[0]                                   # [NB, 2K+1] bf16
    loc_s = (((dr2 + ohr) << 4) | (dc2 + owr)).astype(f32)   # [S, 1]

    iota_hp = jax.lax.broadcasted_iota(jnp.int32, (S, Hp), 1)
    iota_wp = jax.lax.broadcasted_iota(jnp.int32, (S, Wp), 1)
    iota_nb = jax.lax.broadcasted_iota(jnp.int32, (S, NB), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (S, K), 1)
    iota_st = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
    ir = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    strict_tril = (ic > ir).astype(f32)                  # [S, S]; (s', s)→s'<s

    def body(rm_scratch, tot_scratch):
        # ---- per-agent stages 1–4 (small GEMMs stay in VMEM/MXU) ----
        for a in range(A):
            ar_s = ar_ref[0, a]                          # SMEM scalars
            ac_s = ac_ref[0, a]
            rows = dr2 + (ar_s + ohr)                    # [S, 1]
            row_oh = (rows == iota_hp).astype(gdtype)    # [S, Hp]
            tmp = jax.lax.dot_general(
                row_oh, gridcat, (((1,), (0,)), ((), ())),
                precision=gprec, preferred_element_type=f32,
            )                                            # [S, 2*Wp]
            cols = dc2 + (ac_s + owr)                    # [S, 1]
            col_oh = cols == iota_wp
            w0 = jnp.sum(jnp.where(col_oh, tmp[:, :Wp], 0.0), axis=1, keepdims=True)
            w1 = jnp.sum(jnp.where(col_oh, tmp[:, Wp:], 0.0), axis=1, keepdims=True)
            a_plus1 = w0.astype(jnp.int32)               # [S, 1]
            sblock = w1.astype(jnp.int32)
            block_idx = jnp.where(a_plus1 > 0, off_agent + a_plus1 - 1, sblock)

            boh = (block_idx == iota_nb).astype(jnp.bfloat16)   # [S, NB]
            ctk = jax.lax.dot_general(
                boh, comp, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )                                            # [S, 2K+1]
            counts = ctk[:, 2 * K : 2 * K + 1]           # [S, 1] f32 (exact ints)

            # exclusive cumsum via strict-lower-triangular matmul
            cum_excl = jax.lax.dot_general(
                strict_tril, counts, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
            )                                            # [S, 1]
            gcnt_s = gcnt_ref[0, a]
            start = (gcnt_s.astype(f32) + cum_excl).astype(jnp.int32)   # [S, 1]
            total = gcnt_s + jnp.sum(counts).astype(jnp.int32)
            # (vector store: scalar stores to VMEM are unsupported)
            tot_scratch[a : a + 1, :] = jnp.full((1, 128), total, jnp.int32)

            kmask = iota_k < counts.astype(jnp.int32)    # [S, K]
            ctk_loc = jnp.where(kmask, loc_s, 0.0)       # [S, K]
            ctk3 = jnp.concatenate(
                [ctk_loc, ctk[:, : 2 * K]], axis=1
            ).astype(jnp.bfloat16)                       # [S, 3K]

            u_st = (start == iota_st).astype(jnp.bfloat16)      # [S, T]
            rm_at = jax.lax.dot_general(
                ctk3, u_st, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )                                            # [3K, T]
            rm_scratch[:, a, :] = rm_at

        # ---- 5. anti-diagonals: out[a, t] = Σ_k rm[pK+k, a, t-k] ----
        iota_at = jax.lax.broadcasted_iota(jnp.int32, (A, T), 1)
        total_v = tot_scratch[:, 0:1]                    # [A, 1] i32
        valid = iota_at < total_v
        for p in range(3):
            acc = jnp.concatenate(
                [g3_ref[0, p], jnp.zeros((A, T - Gp), f32)], axis=1
            )
            for k in range(K):
                row = rm_scratch[p * K + k]              # [A, T]
                shifted = pltpu.roll(row, k, 1)          # lane roll by k
                acc = acc + jnp.where(iota_at >= k, shifted, 0.0)
            v = acc.astype(jnp.int32).astype(jnp.uint8)
            out_ref[0, p] = jnp.where(valid, v, jnp.uint8(EMPTY))

    pl.run_scoped(
        body,
        pltpu.VMEM((3 * K, A, T), f32),
        pltpu.VMEM((A, 128), jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("A", "S", "T", "K", "NB", "Hp", "Wp", "Gp",
                              "off_agent", "ohr", "owr", "exact_bf16",
                              "interpret")
)
def _call_kernel(gridcat, comp_plus, ar, ac, gcnt, g3, dr, dc,
                 *, A, S, T, K, NB, Hp, Wp, Gp, off_agent, ohr, owr,
                 exact_bf16, interpret=False):
    kernel = functools.partial(
        _obs_kernel, A=A, S=S, T=T, K=K, NB=NB, Hp=Hp, Wp=Wp, Gp=Gp,
        off_agent=off_agent, ohr=ohr, owr=owr, exact_bf16=exact_bf16,
    )
    flops = 2 * A * S * (Hp * 2 * Wp + NB * (2 * K + 1)) + 2 * A * T * S * 3 * K
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 3, A, T), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gridcat [1, Hp, 2Wp]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # comp_plus [1, NB, 2K+1]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ar [1, A]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ac [1, A]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # gcnt [1, A]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # g3 [1, 3, A, Gp]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dr [1, S, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dc [1, S, 1]
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * Hp * Wp * 2 + NB * (2 * K + 1) * 2
            + 3 * A * T, transcendentals=0,
        ),
        interpret=interpret,
    )(gridcat, comp_plus, ar, ac, gcnt, g3, dr, dc)


def render_obs_pallas(state, tables, executed_actions, rewards_at_obs,
                      interpret=False):
    """Single-env obs render via the Pallas kernel; [A, T, 3] uint8.

    Byte-identical to obs.render_observations_ref / obs_mm (pinned by
    tests/test_obs_mm.py). Builds the per-env block table + global-token
    planes with the shared XLA helpers (cheap), then hands the bandwidth-heavy
    window/lookup/compaction stages to the kernel.
    """
    from metta_tpu.engine.obs_mm import (
        _compact_blocks_mm,
        _global_tokens_all,
    )
    from metta_tpu.engine.obs import (
        build_agent_blocks,
        build_assembler_blocks,
        build_chest_blocks,
        build_wall_blocks,
    )
    from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST, KIND_WALL

    A = tables.num_agents
    T = tables.num_obs_tokens
    K = tables.max_tokens_per_cell
    oh_, ow_ = tables.obs_height, tables.obs_width
    ohr, owr = oh_ // 2, ow_ // 2
    H, W = tables.height, tables.width
    NT = tables.n_object_types

    agent_blocks, agent_ok = build_agent_blocks(state, tables)
    wall_blocks, wall_ok = build_wall_blocks(tables)
    if tables.has_assemblers:
        asm_blocks, asm_ok = build_assembler_blocks(state, tables)
    else:
        asm_blocks = jnp.zeros((tables.n_assembler_slots, K, 2), jnp.int32)
        asm_ok = jnp.zeros((tables.n_assembler_slots, K), bool)
    if tables.has_chests:
        chest_blocks, chest_ok = build_chest_blocks(state, tables)
    else:
        chest_blocks = jnp.zeros((tables.n_chest_slots, K, 2), jnp.int32)
        chest_ok = jnp.zeros((tables.n_chest_slots, K), bool)
    blocks = jnp.concatenate([
        jnp.zeros((1, K, 2), jnp.int32), agent_blocks, wall_blocks,
        asm_blocks, chest_blocks,
    ])
    oks = jnp.concatenate([
        jnp.zeros((1, K), bool), agent_ok, wall_ok, asm_ok, chest_ok,
    ])
    NB = int(blocks.shape[0])
    comp_feat, comp_val, counts = _compact_blocks_mm(blocks, oks, K)
    comp_plus = jnp.concatenate(
        [comp_feat, comp_val, counts.astype(jnp.float32)[:, None]], axis=1
    ).astype(jnp.bfloat16)

    off_agent = 1
    off_wall = 1 + A
    off_asm = off_wall + NT
    off_chest = off_asm + tables.n_assembler_slots
    sb = jnp.where(
        state.static_kind == KIND_WALL, off_wall + state.static_type,
        jnp.where(
            state.static_kind == KIND_ASSEMBLER, off_asm + state.static_idx,
            jnp.where(state.static_kind == KIND_CHEST, off_chest + state.static_idx, 0),
        ),
    )
    exact_bf16 = (NB < 256) and (A + 1 < 256)
    gdtype = jnp.bfloat16 if exact_bf16 else jnp.float32
    pad = lambda x: jnp.pad(x, ((ohr, ohr), (owr, owr)))
    gridcat = jnp.concatenate(
        [pad(state.agent_grid.astype(gdtype)), pad(sb.astype(gdtype))], axis=1
    )                                                    # [Hp, 2*Wp]
    Hp, Wp = H + 2 * ohr, W + 2 * owr

    g_count, g_loc, g_feat, g_val = _global_tokens_all(
        state, tables, executed_actions, rewards_at_obs, H // 2, W // 2, ohr, owr
    )
    Gp = int(g_loc.shape[1])
    g3 = jnp.stack([g_loc, g_feat, g_val], axis=0)       # [3, A, Gp]

    scan_dr = jnp.asarray(tables.scan_dr, jnp.int32)
    scan_dc = jnp.asarray(tables.scan_dc, jnp.int32)
    S = int(scan_dr.shape[0])

    out = _call_kernel(
        gridcat[None], comp_plus[None], state.agent_r[None], state.agent_c[None],
        g_count[None], g3[None], scan_dr[None, :, None], scan_dc[None, :, None],
        A=A, S=S, T=T, K=K, NB=NB, Hp=Hp, Wp=Wp, Gp=Gp, off_agent=off_agent,
        ohr=ohr, owr=owr, exact_bf16=exact_bf16, interpret=interpret,
    )                                                    # [1, 3, A, T]
    return jnp.transpose(out[0], (1, 2, 0))              # [A, T, 3]
