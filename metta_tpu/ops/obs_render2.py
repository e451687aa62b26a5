"""Pallas TPU token-observation renderer, v2 (flat agent-window formulation).

Byte-identical to ``engine/obs.py:render_observations_ref`` (reference:
``bindings/mettagrid_c.cpp:397-563``, ``systems/observation_encoder.hpp``)
and to ``engine/obs_mm.py``, but restructured for the TPU's actual cost
model — on-chip the kernel is *op-issue bound*, so every per-agent /
per-column loop from the obvious formulations is folded into batched
whole-array ops:

- All per-(agent, window-cell) quantities live in ONE flat ``[A*Sp, ·]``
  layout (``Sp = 128``-aligned cells per agent) so masks, one-hots and
  lookups are single whole-array ops, not A-loops.
- Agents AND static objects (walls/assemblers/chests) are read from one
  combined block grid (prep merges ``agent_grid`` over the static blocks)
  with a single row-select GEMM + masked column reduce per env.
- The center-out emission order (``packed_coordinate.hpp:74-140``) is baked
  into the token-count prefix-sum matrix (``M[s',s] = rank(s') < rank(s)``),
  so windows stay row-major and nothing is physically permuted.
- Per-agent scalars (positions, global-token counts) enter as ``[A, 1]``
  columns and are broadcast to flat blocks by a static block-selector GEMM —
  the kernel reads no SMEM scalars at all.
- Only the per-agent slot-scatter GEMMs (``[Sp, 3K] x [Sp, T]``) remain a
  loop (their operands differ per agent); the anti-diagonal accumulation
  that resolves intra-cell token offsets runs ONCE per grid step over all
  ``EPS × A`` agent rows.

The HBM traffic per env is ~45 KB in / 14 KB out; every one-hot operand
(what made the pure-XLA renderer HBM-bound at tens of GB/step) exists only
in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from metta_tpu.engine.xprec import exact_matmuls
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EMPTY = 255
SP = 128          # 128-aligned per-agent cell block (S = window cells <= SP)
AP = 32           # sublane-aligned per-env agent rows in the rm/acc layout


def _obs2_kernel(sb_ref, comp_ref, rc_ref, gcnt_ref, g3_ref,
                 mperm_ref, stat_ref, bsel_ref, lane_ref, tlane_ref,
                 out_ref, *, A, S, T, K, NB, Hp, Wp, Gp, WIN, EPS, Tp):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    F = A * SP
    R = EPS * AP
    C = 2 * K + 1

    # loop-invariant index planes enter as resident inputs — the grid re-runs
    # the kernel body every step, so in-body iota/astype would re-execute
    # E/EPS times
    blocksel = bsel_ref[0]           # [F, A] bf16 static block selector
    lane = lane_ref[0]               # [1, 128] f32: 0..127 (broadcast compare)
    tlane = tlane_ref[0]             # [1, Tp] f32: 0..Tp-1
    mperm = mperm_ref[0]             # [SP, SP] f32 (rank-aware, padded)
    drow = stat_ref[0, :, 0:1]       # [F, 1] f32 window row offset (pad -1e6)
    dcol = stat_ref[0, :, 1:2]
    loc_f = stat_ref[0, :, 2:3]      # [F, 1] f32 packed location byte
    ones_wp = jnp.ones((Wp, 1), bf16)
    ones_sp = jnp.ones((SP, 1), bf16)

    def one_env(e, rm, tot):
        sb = sb_ref[e]                                   # [Hp, Wp] bf16
        comp = comp_ref[e]                               # [NB, C] bf16
        rc_col = rc_ref[e]                               # [A, 2] f32
        gcnt_row = gcnt_ref[e, :, 0][None, :]            # [1, A] f32
        gcnt_col = gcnt_ref[e]                           # [A, 1] f32

        # broadcast per-agent window origin to flat blocks (one GEMM)
        rcb = jax.lax.dot_general(
            blocksel, rc_col.astype(bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                                # [F, 2]
        rows = rcb[:, 0:1] + drow                        # [F, 1] (pad << 0)
        cols = rcb[:, 1:2] + dcol

        # ---- window values: one combined agent+static grid read (GEMM) ----
        # (prep merges agent occupancy into the block grid, so one row-select
        #  GEMM + masked column reduce yields the block id for every window
        #  cell — no separate agent position match)
        row_oh = (rows == lane[:, :Hp]).astype(bf16)     # [F, Hp]
        tmp_sb = jax.lax.dot_general(
            row_oh, sb, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                                # [F, Wp]
        colmask = cols == lane[:, :Wp]                   # [F, Wp]
        block_idx = jax.lax.dot_general(
            jnp.where(colmask, tmp_sb, 0.0).astype(bf16), ones_wp,
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )                                                # [F, 1]

        # ---- per-cell token triples + counts: one [F, NB] one-hot GEMM ----
        boh = (block_idx == lane[:, :NB]).astype(bf16)
        ctk = jax.lax.dot_general(
            boh, comp, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )                                                # [F, C]
        counts = ctk[:, 2 * K : 2 * K + 1]               # [F, 1]

        # ---- scan-order prefix sum, all agents at once ----
        # [F, 1] -> [A, SP] -> [SP, A]: one sublane-split relayout + one
        # transpose (the 24-slice concat this replaces cost ~7% of the kernel)
        counts_lane = jnp.reshape(counts, (A, SP)).T     # [SP, A]
        start_lane = jax.lax.dot_general(
            mperm, counts_lane, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
        ) + gcnt_row                                     # [SP, A]
        totals_col = jax.lax.dot_general(
            counts_lane.astype(bf16), ones_sp, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + gcnt_col                                     # [A, 1]
        tot[e * AP : e * AP + A, :] = jnp.broadcast_to(
            totals_col.astype(jnp.int32), (A, 128)
        )

        # ---- token triple planes in flat layout ----
        kmask = lane[:, :K] < counts                     # [F, K]
        ctk_loc = jnp.where(kmask, loc_f, 0.0)           # [F, K]
        ctk3 = jnp.concatenate(
            [ctk_loc, ctk[:, : 2 * K]], axis=1
        ).astype(bf16)                                   # [F, 3K]

        # ---- per-agent slot scatter (operands differ per agent; a batched
        # 3D dot_general was measured SLOWER than this unrolled loop) ----
        for a in range(A):
            start_a = start_lane[:, a : a + 1]                     # [SP, 1]
            u = (start_a == tlane).astype(bf16)                    # [SP, Tp]
            res = jax.lax.dot_general(
                ctk3[a * SP : (a + 1) * SP], u,
                (((0,), (0,)), ((), ())), preferred_element_type=f32,
            )                                                      # [3K, Tp]
            rm[:, e * AP + a, :] = res.astype(rm.dtype)

    def antidiag(rm, tot):
        total_v = tot[:, 0:1].astype(f32)                # [R, 1]
        tmask = tlane < total_v
        # g3 merges on the way out so this loop is a pure roll-accumulate
        # over whole [R, Tp] tiles (EPS*A agent rows at once).
        for p in range(3):
            acc = jnp.zeros((R, Tp), f32)
            for k in range(K):
                row = rm[p * K + k]                      # [R, Tp]
                shifted = pltpu.roll(row, k, 1)
                if T > Tp - K:
                    # wrapped lanes could carry real tokens — mask them
                    shifted = jnp.where(tlane >= float(k), shifted, 0.0)
                acc = acc + shifted
            acci = acc.astype(jnp.int32)
            for e in range(EPS):
                g = g3_ref[e, p].astype(jnp.int32)
                block = acci[e * AP : e * AP + A, :T]
                gfull = jnp.concatenate(
                    [g, jnp.zeros((A, T - Gp), jnp.int32)], axis=1
                )
                merged = (block + gfull).astype(jnp.uint8)   # disjoint slots
                vmask = tmask[e * AP : e * AP + A, :T]
                out_ref[e, p] = jnp.where(vmask, merged, jnp.uint8(EMPTY))

    def body(rm, tot):
        for e in range(EPS):
            one_env(e, rm, tot)
        antidiag(rm, tot)

    pl.run_scoped(
        body,
        pltpu.VMEM((3 * K, R, Tp), jnp.float32),
        pltpu.VMEM((R, 128), jnp.int32),
    )


def _C(K):
    return 2 * K + 1


@functools.partial(
    jax.jit,
    static_argnames=("A", "S", "T", "K", "NB", "Hp", "Wp", "Gp", "WIN",
                     "EPS", "Tp", "interpret"),
)
def _call_kernel2(sb, comp_plus, rc, gcnt, g3, mperm, stat, bsel,
                  lane, tlane,
                  *, A, S, T, K, NB, Hp, Wp, Gp, WIN, EPS, Tp,
                  interpret=False):
    E = sb.shape[0]
    assert E % EPS == 0
    kernel = functools.partial(
        _obs2_kernel, A=A, S=S, T=T, K=K, NB=NB, Hp=Hp, Wp=Wp, Gp=Gp,
        WIN=WIN, EPS=EPS, Tp=Tp,
    )
    F = A * SP
    flops = EPS * 2 * F * (A + Hp + Wp + NB * _C(K) + 3 * K * Tp // SP)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E, 3, A, T), jnp.uint8),
        grid=(E // EPS,),
        in_specs=[
            pl.BlockSpec((EPS, Hp, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EPS, NB, _C(K)), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EPS, A, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EPS, A, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EPS, 3, A, Gp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, SP), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, 3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, A), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EPS, 3, A, T), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=EPS * (Hp * Wp * 2 + NB * _C(K) * 2 + 3 * A * T),
            transcendentals=0,
        ),
        interpret=interpret,
    )(sb, comp_plus, rc, gcnt, g3, mperm, stat, bsel, lane, tlane)


def _rank_tril(tables) -> np.ndarray:
    """[SP, SP] f32: M[s', s] = 1 iff center-out rank(s') < rank(s), for
    row-major window cells s = j*WIN + i; pad rows/cols zero."""
    WIN = int(tables.obs_height)
    ohr = WIN // 2
    scan_dr = np.asarray(tables.scan_dr)
    scan_dc = np.asarray(tables.scan_dc)
    S = scan_dr.shape[0]
    rank = np.empty((S,), np.int64)
    for pos in range(S):
        cell = (scan_dr[pos] + ohr) * WIN + (scan_dc[pos] + ohr)
        rank[cell] = pos
    m = np.zeros((SP, SP), np.float32)
    m[:S, :S] = (rank[:, None] < rank[None, :]).astype(np.float32)
    return m


def _static_cols(tables, A) -> np.ndarray:
    """[A*SP, 3] f32: per flat slot (drow, dcol, locbyte); pad rows get a
    -1e6 row offset so every position/cell compare misses."""
    WIN = int(tables.obs_height)
    j, i = np.meshgrid(np.arange(WIN), np.arange(WIN), indexing="ij")
    dr = j.reshape(-1).astype(np.float32)
    dc = i.reshape(-1).astype(np.float32)
    loc = ((j << 4) | i).reshape(-1).astype(np.float32)
    S = WIN * WIN
    out = np.full((A * SP, 3), -1e6, np.float32)
    for a in range(A):
        out[a * SP : a * SP + S, 0] = dr
        out[a * SP : a * SP + S, 1] = dc
        out[a * SP : a * SP + S, 2] = loc
    return out


@exact_matmuls
def prep_core(state, tables, ea, rw):
    """Per-env XLA prep shared by the v2/v3 pallas renderers: raw compacted
    block token planes, combined agent+static block grid, global token
    planes, agent positions.

    Returns (comp_feat, comp_val, counts [NB,K]/[NB] f32/i32, sb [H,W] i32
    combined block grid, g_count [A], g_loc/g_feat/g_val [A, Gp], rc [A,2]).
    """
    from metta_tpu.engine.obs import (
        build_agent_blocks,
        build_assembler_blocks,
        build_chest_blocks,
        build_wall_blocks,
    )
    from metta_tpu.engine.obs_mm import _compact_blocks_mm, _global_tokens_all
    from metta_tpu.engine.state import KIND_ASSEMBLER, KIND_CHEST, KIND_WALL

    A = tables.num_agents
    K = tables.max_tokens_per_cell
    WIN = int(tables.obs_height)
    ohr, owr = WIN // 2, int(tables.obs_width) // 2
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
    comp_feat, comp_val, counts = _compact_blocks_mm(blocks, oks, K)

    sbg = getattr(tables, "obs_static_bg", None)
    if sbg is None:
        off_wall = 1 + A
        off_asm = off_wall + NT
        off_chest = off_asm + tables.n_assembler_slots
        sbg = jnp.where(
            state.static_kind == KIND_WALL, off_wall + state.static_type,
            jnp.where(
                state.static_kind == KIND_ASSEMBLER, off_asm + state.static_idx,
                jnp.where(state.static_kind == KIND_CHEST,
                          off_chest + state.static_idx, 0),
            ),
        )
    # else: the env attached the per-map static block grid to the tables at
    # build time — static objects never move mid-episode, so the 3-way where
    # chain above is per-episode constant and wasted per-step work.
    # Merge agent occupancy (agent_grid holds 1+agent_id, matching block
    # ids 1..A): one combined grid read in the kernel replaces the
    # position-match machinery.
    sb = jnp.where(state.agent_grid > 0, state.agent_grid, sbg)

    g_count, g_loc, g_feat, g_val = _global_tokens_all(
        state, tables, ea, rw, H // 2, W // 2, ohr, owr
    )
    rc = jnp.stack([state.agent_r, state.agent_c], axis=1)   # [A, 2]
    return comp_feat, comp_val, counts, sb, g_count, g_loc, g_feat, g_val, rc


@exact_matmuls
def prep_env(state, tables, ea, rw):
    """Per-env XLA prep for the v2 pallas renderer: compacted block token
    table, combined agent+static block grid, global tokens, agent positions.

    Shared by ``render_obs_pallas2`` and the profiling scripts so the profile
    always decomposes exactly what the renderer runs.
    """
    WIN = int(tables.obs_height)
    ohr, owr = WIN // 2, int(tables.obs_width) // 2
    (comp_feat, comp_val, counts, sb,
     g_count, g_loc, g_feat, g_val, rc) = prep_core(state, tables, ea, rw)
    comp_plus = jnp.concatenate(
        [comp_feat, comp_val, counts.astype(jnp.float32)[:, None]], axis=1
    ).astype(jnp.bfloat16)
    sbp = jnp.pad(sb, ((ohr, ohr), (owr, owr))).astype(jnp.bfloat16)
    g3 = jnp.stack([g_loc, g_feat, g_val], axis=0)     # [3, A, Gp]
    return (sbp, comp_plus,
            rc.astype(jnp.float32), g_count.astype(jnp.float32)[:, None],
            g3)


def render_obs_pallas2(state_b, tables, executed_actions_b, rewards_b,
                       eps: int = 4, interpret: bool = False,
                       stacked_tables=None, task_id=None):
    """Batched obs render → [E, A, T, 3] uint8 (byte-identical to obs_mm).

    Takes the batched env state directly: the cheap per-env prep (block
    tables, global tokens, static block grid) runs as vmapped XLA, then one
    pallas_call over an env grid does the render. ``eps`` = envs per grid
    step (must divide E).

    Multi-task mode (``stacked_tables`` + ``task_id [E]``): the per-env prep
    gathers each env's table rows from the K-stacked task set
    (``engine/taskset.py``); the kernel itself only depends on the shared
    statics (obs geometry), so one compiled render serves every task.
    """
    A = tables.num_agents
    T = tables.num_obs_tokens
    K = tables.max_tokens_per_cell
    WIN = int(tables.obs_height)
    ohr, owr = WIN // 2, int(tables.obs_width) // 2
    H, W = tables.height, tables.width
    Hp, Wp = H + 2 * ohr, W + 2 * owr
    assert WIN * WIN <= SP and A <= AP

    if stacked_tables is not None:
        def prep_mt(state, ea, rw, tid):
            te = jax.tree.map(lambda x: x[tid], stacked_tables)
            return prep_env(state, te, ea, rw)

        sbp, comp_plus, rc, gcnt, g3 = jax.vmap(prep_mt)(
            state_b, executed_actions_b, rewards_b, task_id
        )
    else:
        sbp, comp_plus, rc, gcnt, g3 = jax.vmap(
            lambda s, ea, rw: prep_env(s, tables, ea, rw)
        )(state_b, executed_actions_b, rewards_b)
    NB = int(comp_plus.shape[1])
    Gp = int(g3.shape[3])
    Tp = ((T + 127) // 128) * 128

    mperm = jnp.asarray(_rank_tril(tables))[None]
    stat = jnp.asarray(_static_cols(tables, A))[None]
    F = A * SP
    bsel = jnp.asarray(
        (np.arange(F)[:, None] // SP == np.arange(A)[None, :])
    ).astype(jnp.bfloat16)[None]
    lane = jnp.arange(128, dtype=jnp.float32)[None, None, :]
    tlane = jnp.arange(Tp, dtype=jnp.float32)[None, None, :]

    out = _call_kernel2(
        sbp, comp_plus, rc, gcnt, g3, mperm, stat, bsel, lane, tlane,
        A=A, S=WIN * WIN, T=T, K=K, NB=NB, Hp=Hp, Wp=Wp, Gp=Gp, WIN=WIN,
        EPS=eps, Tp=Tp, interpret=interpret,
    )                                                      # [E, 3, A, T]
    return jnp.transpose(out, (0, 2, 3, 1))                # [E, A, T, 3]
