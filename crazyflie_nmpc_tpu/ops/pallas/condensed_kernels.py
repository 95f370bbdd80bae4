"""Fused Pallas kernels for the PARTIALLY CONDENSED multistage QP (block 2).

This is the TPU-native form of the reference's QP backend choice: acados
generates `PARTIAL_CONDENSING_HPIPM` (generate_c_code.py:140) — condense
groups of shooting intervals into one stage with a stacked input, then run
the structure-exploiting IPM on the shorter horizon.  Condensing N=50
stages into M=25 pairs

  * halves the sequential Riccati depth (half the P-carry dependency
    chain on the Pallas grid), and
  * cuts the factorization MACs per original stage ~28% (one dense
    13x13 P-recursion amortizes over two stages; the input dimension
    grows to 8, where the 8x8 Cholesky is still trace-time unrolled),

which is why HPIPM does it on CPUs and why it pays on the VPU: the
diagonal-cost backward sweep measures ~77% of vector-unit peak, so the
remaining speed comes from doing fewer FLOPs, not from better scheduling.

Exactness: block-2 condensing is an EXACT reparametrization — interior
states x_{2k+1} are eliminated through their dynamics row, bounds live on
the (unchanged, re-stacked) inputs, so the condensed QP's KKT solution
maps 1:1 onto the original (tests pin this against `ops.ipm`).

The condensed stage cost is no longer diagonal: Q' = Q0 + A0' Q1 A0 is
dense, there is a state-input cross term S' = [A0' Q1 B0, 0], and the
input Hessian gains a dense 4x4 block R00 = B0' Q1 B0.  The sweep kernels
here implement the general cross-term Riccati recursion
(Qux = S'^T + B'^T P A'), which the diagonal-cost kernels in
`riccati_kernels.py` do not need.

Layout contract matches riccati_kernels.py: batch-LAST (stage, n, m, B),
B rides the VPU lanes.
"""

from __future__ import annotations

import functools as _ft

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from crazyflie_nmpc_tpu.ops.pallas.riccati_kernels import (
    NU,
    NX,
    _add_diag,
    _mm,
    _mtm,
    _mtv,
    _mv,
)

NUC = 2 * NU                    # condensed (stacked) input dimension
NLC = NUC * (NUC + 1) // 2      # packed Cholesky entries for 8x8


# ---------------------------------------------------------------------------
# compressed (bf16) HBM streams
# ---------------------------------------------------------------------------
#
# The round-4 speed-of-light study (docs/PERF.md, tools/ipm_iter_sol.py)
# measured `corrector_sweep_c2` AT its HBM streaming floor and `kkt_sweep_c2`
# with a 0.74 ms bandwidth floor out of a 1.377 ms launch — "fewer bytes is
# the only lever" for both.  These helpers implement that lever: selected
# streams are stored in HBM as bfloat16 (half the bytes) and upcast to the
# compute dtype at load; ALL in-kernel arithmetic stays f32 (or f64 in
# interpret-mode tests).  Two independent knobs, adjudicated by measurement
# (IPMConfig.compress_gains / compress_ab; accuracy tables in docs/PERF.md):
#
#   * gains: K / L / Pc are written bf16 by the kkt sweep and re-read bf16
#     by the corrector (the QP data stays exact; the corrector direction
#     becomes slightly inexact — an inexact-Newton refinement step).
#   * ab: the condensed stage stream Abar / Bbar / cbar is stored bf16 —
#     this perturbs the QP itself, so Abar is DEVIATION-CODED: the kernel
#     receives D = Abar − I and reconstructs A = D + I at load, putting the
#     bf16 rounding on the O(dt·J) deviation instead of the unit diagonal
#     (~10-30x smaller absolute error at zero byte cost).


def _ld(v, cdt):
    """Upcast a loaded (possibly bf16-compressed) block to the compute
    dtype; identity for uncompressed streams."""
    return v.astype(cdt) if v.dtype != cdt else v


def _ld_A(A_ref, j, cdt, a_dev, eye):
    """Load a stage's A block, undoing deviation coding when active."""
    A = _ld(A_ref[j], cdt)
    return A + eye if a_dev else A


def _eye_nx(cdt):
    return jnp.eye(NX, dtype=cdt)[:, :, None]


# ---------------------------------------------------------------------------
# generic packed Cholesky (column-major lower packing, entries are (B,) lanes)
# ---------------------------------------------------------------------------

def _pk(i, j, n):
    """Packed index of L[i, j] (i >= j), column-major lower."""
    return j * n - j * (j - 1) // 2 + (i - j)


def _chol_n(M, n):
    """Unrolled n x n Cholesky of (n, n, B) -> packed lower (n(n+1)/2, B).

    rsqrt formulation: the round-4 op-deletion ablation measured the
    chol+solve group at 21% of the kkt launch — far above its MAC share —
    with VPU divide/sqrt cost the driver.  ljj = s*rsqrt(s) and
    inv = rsqrt(s) replace one sqrt + one divide per column with one
    rsqrt + one multiply (docs/PERF.md speed-of-light table)."""
    L = [None] * (n * (n + 1) // 2)
    for j in range(n):
        s = M[j, j]
        for t in range(j):
            s = s - L[_pk(j, t, n)] * L[_pk(j, t, n)]
        inv = jax.lax.rsqrt(s)
        L[_pk(j, j, n)] = s * inv
        for i in range(j + 1, n):
            s = M[i, j]
            for t in range(j):
                s = s - L[_pk(i, t, n)] * L[_pk(j, t, n)]
            L[_pk(i, j, n)] = s * inv
    return jnp.stack(L)


def _cho_diag_inv(L, n):
    """(n,) reciprocals of the packed diagonal — hoisted once per solve so
    the substitution rows multiply instead of divide (a lane-wide divide
    per row was ~2x the cost of the FMA it replaced, measured)."""
    return [1.0 / L[_pk(i, i, n)] for i in range(n)]


def _cho_solve_n(L, Y, n, m):
    """Solve (L L^T) X = Y, packed L (n(n+1)/2, B), Y (n, m, B)."""
    inv = _cho_diag_inv(L, n)
    z = [None] * n
    for i in range(n):
        s = Y[i]
        for t in range(i):
            s = s - L[_pk(i, t, n)][None, :] * z[t]
        z[i] = s * inv[i][None, :]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = z[i]
        for t in range(i + 1, n):
            s = s - L[_pk(t, i, n)][None, :] * x[t]
        x[i] = s * inv[i][None, :]
    return jnp.stack(x)


def _cho_solve_n_vec(L, y, n):
    """Solve (L L^T) x = y, packed L, y (n, B)."""
    inv = _cho_diag_inv(L, n)
    z = [None] * n
    for i in range(n):
        s = y[i]
        for t in range(i):
            s = s - L[_pk(i, t, n)] * z[t]
        z[i] = s * inv[i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = z[i]
        for t in range(i + 1, n):
            s = s - L[_pk(t, i, n)] * x[t]
        x[i] = s * inv[i]
    return jnp.stack(x)


# ---------------------------------------------------------------------------
# block-2 condensing (embarrassingly parallel over pairs)
# ---------------------------------------------------------------------------

def _condense2_kernel(ms, A_ref, B_ref, c_ref, qxx_ref, qx_ref, ru_ref,
                      Ab_out, Bb_out, cb_out, Qb_out, S1T_out, R00_out,
                      qb_out, rb_out):
    for j in range(ms):
        A0 = A_ref[2 * j]          # x_{2k}   -> x_{2k+1}
        A1 = A_ref[2 * j + 1]      # x_{2k+1} -> x_{2k+2}
        B0 = B_ref[2 * j]
        B1 = B_ref[2 * j + 1]
        c0 = c_ref[2 * j]
        c1 = c_ref[2 * j + 1]
        q1 = qxx_ref[2 * j + 1]    # eliminated state's cost diagonal

        # condensed dynamics
        Ab_out[j] = _mm(A1, A0, NX, NX, NX)
        Bb_out[j] = jnp.concatenate(
            [_mm(A1, B0, NX, NX, NU), B1], axis=1)
        cb_out[j] = _mv(A1, c0, NX, NX) + c1

        # condensed cost: eliminate x1 = A0 x + B0 u0 + c0 through the
        # diagonal stage cost q1 (exact; cf. ops/condensing.py)
        qA = q1[:, None, :] * A0                      # diag(q1) A0
        qB = q1[:, None, :] * B0
        Qb_out[j] = _add_diag(_mtm(A0, qA, NX, NX, NX),
                              qxx_ref[2 * j], NX)
        S1T_out[j] = _mtm(B0, qA, NX, NU, NX)         # (4,13) = B0' q1 A0
        R00_out[j] = _mtm(B0, qB, NX, NU, NU)
        h = q1 * c0 + qx_ref[2 * j + 1]
        qb_out[j] = qx_ref[2 * j] + _mtv(A0, h, NX, NX)
        rb_out[j] = jnp.concatenate(
            [ru_ref[2 * j] + _mtv(B0, h, NX, NU), ru_ref[2 * j + 1]],
            axis=0)


def condense2(A, B, c, qxx, qx, ru, block_b: int = 128,
              stages_per_step: int = 5, interpret: bool = False):
    """Condense stage pairs: (N-stage diagonal-cost QP data) -> M = N/2
    stage dense-cost data.  All arrays batch-last.

    Returns dict with Abar (M,13,13,·), Bbar (M,13,8,·), cbar (M,13,·),
    Qbar (M,13,13,·), S1T (M,4,13,·) [S̄^T's nonzero half], R00 (M,4,4,·),
    qbar (M,13,·), rbar (M,8,·).
    """
    N, _, Btot = c.shape
    if N % 2 != 0:
        raise ValueError("block-2 condensing needs even N")
    M = N // 2
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    dtype = c.dtype
    ngrid = M // ms

    def spec_in(sp):
        def idx(b, n):
            return (n,) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((2 * ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def spec_out(sp):
        def idx(b, n):
            return (n,) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((M, NX, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, NUC, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NU, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NU, NU, Btot), dtype),
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
    )
    outs = pl.pallas_call(
        _ft.partial(_condense2_kernel, ms),
        grid=(nb, ngrid),
        in_specs=[spec_in((NX, NX)), spec_in((NX, NU)), spec_in((NX,)),
                  spec_in((NX,)), spec_in((NX,)), spec_in((NU,))],
        out_specs=(spec_out((NX, NX)), spec_out((NX, NUC)),
                   spec_out((NX,)), spec_out((NX, NX)),
                   spec_out((NU, NX)), spec_out((NU, NU)),
                   spec_out((NX,)), spec_out((NUC,))),
        out_shape=out_shape,
        interpret=interpret,
    )(A, B, c, qxx, qx, ru)
    keys = ("Abar", "Bbar", "cbar", "Qbar", "S1T", "R00", "qbar", "rbar")
    return dict(zip(keys, outs))


# ---------------------------------------------------------------------------
# interior-state expansion (embarrassingly parallel over pairs)
# ---------------------------------------------------------------------------

def _expand2_kernel(ms, stride, A_ref, B_ref, c_ref, dxe_ref, du_ref,
                    dxo_out):
    # stride=2: A/B/c blocks cover both stages of each pair (2ms rows);
    # only the even (first-of-pair) rows drive the eliminated state's
    # dynamics row.  stride=1: A/B already even-only (prep_condense2).
    for j in range(ms):
        dxo_out[j] = (_mv(A_ref[stride * j], dxe_ref[j], NX, NX)
                      + _mv(B_ref[stride * j], du_ref[j], NX, NU)
                      + c_ref[2 * j])


def expand2(A, B, c, dx_even, du0, block_b: int = 128,
            stages_per_step: int = 5, interpret: bool = False,
            even_only: bool = False):
    """Recover the eliminated odd states through their dynamics row:
    dx_odd[k] = A[2k] dx_even[k] + B[2k] du0[k] + c[2k].

    A/B are the ORIGINAL (N-stage, batch-last) data — or, with
    even_only=True, just the even (first-of-pair) stages (M-major, the
    `prep_condense2` outputs).  c is always the full N-stage defect;
    dx_even (M,13,·) and du0 (M,4,·) are the condensed solution's states
    and first-of-pair inputs.  One VPU launch replaces the XLA
    batched-einsum path (which runs tiny per-lane matvecs at a fraction
    of the bandwidth bound).
    """
    N, _, Btot = c.shape
    M = N // 2
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    ngrid = M // ms
    stride = 1 if even_only else 2

    def spec_in(sp, rows):
        def idx(b, n):
            return (n,) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((rows,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    ab_rows = ms if even_only else 2 * ms
    dxo = pl.pallas_call(
        _ft.partial(_expand2_kernel, ms, stride),
        grid=(nb, ngrid),
        in_specs=[spec_in((NX, NX), ab_rows), spec_in((NX, NU), ab_rows),
                  spec_in((NX,), 2 * ms), spec_in((NX,), ms),
                  spec_in((NU,), ms)],
        out_specs=spec_in((NX,), ms),
        out_shape=jax.ShapeDtypeStruct((M, NX, Btot), c.dtype),
        interpret=interpret,
    )(A, B, c, dx_even, du0)
    return dxo


# ---------------------------------------------------------------------------
# fused KKT sweep on the condensed problem (dense cost + cross term)
# ---------------------------------------------------------------------------

def _kkt_c2_kernel(ms, ngrid, ablate, sym_period, a_dev, A_ref, B_ref,
                   c_ref, Q_ref, S1T_ref, R00_ref, qx_ref, ruu_ref, ru_ref,
                   Pt_ref, pt_ref, dx0_ref,
                   K_out, kff_out, L_out, Pc_out, dx_out, du_out, dxT_out,
                   P_scr, p_scr, K_all, kff_all, dx_scr):
    # `ablate` (frozenset of op names) is MEASUREMENT-ONLY: each named op
    # is replaced by a cheap same-shape stand-in so its cost can be read
    # off by re-timing (the op-deletion ablation of docs/PERF.md).  Empty
    # (the only value production code passes) traces the exact original.
    # `a_dev` marks the A stream as deviation-coded (compressed-stream
    # mode — see the module-top note): A = A_ref + I at load.
    n = pl.program_id(1)
    cdt = Q_ref.dtype          # compute dtype (Q is never compressed)
    eye_a = _eye_nx(cdt) if a_dev else None

    @pl.when(n == 0)
    def _():
        eye = jnp.eye(NX, dtype=Pt_ref.dtype)[:, :, None]
        P_scr[:] = eye * Pt_ref[:][None, :, :]
        p_scr[:] = pt_ref[:]

    @pl.when(n < ngrid)
    def _backward_phase():
        base = (ngrid - 1 - n) * ms
        for j in range(ms - 1, -1, -1):
            A = _ld_A(A_ref, j, cdt, a_dev, eye_a)
            Bm = _ld(B_ref[j], cdt)
            c = _ld(c_ref[j], cdt)
            P = P_scr[:]
            p = p_scr[:]

            PA = A if "PA" in ablate else _mm(P, A, NX, NX, NX)
            PB = Bm if "PB" in ablate else _mm(P, Bm, NX, NX, NUC)
            Pc = c if "Pc" in ablate else _mv(P, c, NX, NX)
            m = p + Pc

            # Quu = R̄ + B̄'PB̄ + diag(ruu_shift); R̄'s dense block is the
            # top-left 4x4 (R00), rest of R̄ is in the ruu_shift diagonal
            BtPB = (PB[:NUC] if "BtPB" in ablate
                    else _mtm(Bm, PB, NX, NUC, NUC))
            z44 = jnp.zeros_like(R00_ref[j])
            R00p = jnp.concatenate([
                jnp.concatenate([R00_ref[j], z44], axis=1),
                jnp.concatenate([z44, z44], axis=1)], axis=0)
            Quu = _add_diag(BtPB + R00p, ruu_ref[j], NUC)

            # Qux = S̄' + B̄'PA with S̄' = [S1T; 0]
            S1T = S1T_ref[j]
            SxT = jnp.concatenate([S1T, jnp.zeros_like(S1T)], axis=0)
            Qux = (PA[:NUC] if "Qux" in ablate
                   else SxT + _mtm(Bm, PA, NX, NUC, NX))
            Qu = ru_ref[j] + _mtv(Bm, m, NX, NUC)

            if "chol" in ablate:
                L = Quu[0, :1] * jnp.ones((NLC, 1), Quu.dtype)
                K = -Qux
                kff = -Qu
            else:
                L = _chol_n(Quu, NUC)
                K = -_cho_solve_n(L, Qux, NUC, NX)
                kff = -_cho_solve_n_vec(L, Qu, NUC)

            APA = PA if "APA" in ablate else _mtm(A, PA, NX, NX, NX)
            QK = (PA if "QK" in ablate
                  else _mtm(Qux, K, NUC, NX, NX))
            P_new = Q_ref[j] + APA + QK
            # P symmetrization costs 5.9% of the launch (SoL ablation) —
            # sym_period > 1 re-symmetrizes only every period-th stage of
            # each stage block (trace-time static), bounding the f32
            # asymmetry drift at a fraction of the cost
            if "sym" not in ablate and j % sym_period == 0:
                P_new = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
            p_new = qx_ref[j] + _mtv(A, m, NX, NX) + _mtv(K, Qu, NUC, NX)

            # gains may be emitted bf16 (compress_gains): the corrector
            # re-reads them at half the bytes; the in-kernel recursion and
            # this kernel's own forward phase stay full-precision (the
            # f32 K_all/kff_all scratch)
            K_out[j] = K.astype(K_out.dtype)
            kff_out[j] = kff
            L_out[j] = L.astype(L_out.dtype)
            Pc_out[j] = Pc.astype(Pc_out.dtype)
            K_all[pl.dslice(base + j, 1)] = K[None]
            kff_all[pl.dslice(base + j, 1)] = kff[None]

            P_scr[:] = P_new
            p_scr[:] = p_new

    @pl.when(n == ngrid)
    def _():
        dx_scr[:] = dx0_ref[:]

    @pl.when(n >= ngrid)
    def _forward_phase():
        base = (n - ngrid) * ms
        for j in range(ms):
            dx = dx_scr[:]
            K = K_all[pl.dslice(base + j, 1)][0]
            kff = kff_all[pl.dslice(base + j, 1)][0]
            if "fwd" in ablate:
                du = kff
                dx_next = dx + _ld(c_ref[j], cdt)
            else:
                du = _mv(K, dx, NUC, NX) + kff
                dx_next = (_mv(_ld_A(A_ref, j, cdt, a_dev, eye_a), dx,
                               NX, NX)
                           + _mv(_ld(B_ref[j], cdt), du, NX, NUC)
                           + _ld(c_ref[j], cdt))
            dx_out[j] = dx
            du_out[j] = du
            dx_scr[:] = dx_next
        # the final grid step leaves the TERMINAL state here (last write
        # wins) — emitting it from the kernel removes an XLA per-lane
        # matvec + concat tail per launch
        dxT_out[:] = dx_scr[:]


def kkt_sweep_c2(Abar, Bbar, cbar, Qbar, S1T, R00, qx, ruu_shift, ru,
                 pT_dense_diag, p_term, dx0, block_b: int = 128,
                 stages_per_step: int = 5, interpret: bool = False,
                 ablate: frozenset = frozenset(), sym_period: int = 1,
                 gains_dtype=None, a_dev: bool = False):
    """Fused dense-cost Riccati factorization + forward rollout over the
    condensed horizon.  qx/ru are the current (residual) linear terms;
    ruu_shift (M,8,·) is the diagonal part of R̄ incl. the IPM barrier
    shift.  Returns (K (M,8,13,·), kff, L (M,36,·), Pc (M,13,·),
    dx (M+1,13,·), du (M,8,·)).

    Compressed streams (module-top note): `gains_dtype=jnp.bfloat16`
    emits K/L/Pc at half the bytes for the corrector to re-read;
    `a_dev=True` marks Abar as deviation-coded (callers pass Abar − I,
    which may itself be bf16 along with Bbar/cbar)."""
    M = Abar.shape[0]
    Btot = Abar.shape[-1]
    dtype = Qbar.dtype
    gdt = gains_dtype or dtype
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    ngrid = M // ms

    def mk_spec(sp, idx_of_n):
        def idx(b, n):
            return (idx_of_n(n),) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    both = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, n - ngrid))
    bwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, 0))
    fwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, 0, n - ngrid))

    def spec_const(sp):
        def idx(b, n):
            return (0,) * len(sp) + (b,)
        return pl.BlockSpec(sp + (block_b,), idx, memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((M, NUC, NX, Btot), gdt),
        jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
        jax.ShapeDtypeStruct((M, NLC, Btot), gdt),
        jax.ShapeDtypeStruct((M, NX, Btot), gdt),
        jax.ShapeDtypeStruct((M, NX, Btot), dtype),
        jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
        jax.ShapeDtypeStruct((NX, Btot), dtype),
    )
    out_specs = (bwd((NUC, NX)), bwd((NUC,)), bwd((NLC,)), bwd((NX,)),
                 fwd((NX,)), fwd((NUC,)), spec_const((NX,)))
    in_specs = [
        both((NX, NX)), both((NX, NUC)), both((NX,)),
        bwd((NX, NX)), bwd((NU, NX)), bwd((NU, NU)),
        bwd((NX,)), bwd((NUC,)), bwd((NUC,)),
        spec_const((NX,)), spec_const((NX,)), spec_const((NX,)),
    ]
    scratch = [
        pltpu.VMEM((NX, NX, block_b), dtype),
        pltpu.VMEM((NX, block_b), dtype),
        pltpu.VMEM((M, NUC, NX, block_b), dtype),
        pltpu.VMEM((M, NUC, block_b), dtype),
        pltpu.VMEM((NX, block_b), dtype),
    ]
    K, kff, L, Pc, dxs, dus, dxT = pl.pallas_call(
        _ft.partial(_kkt_c2_kernel, ms, ngrid, ablate, sym_period, a_dev),
        grid=(nb, 2 * ngrid),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(Abar, Bbar, cbar, Qbar, S1T, R00, qx, ruu_shift, ru,
      pT_dense_diag, p_term, dx0)
    dx_all = jnp.concatenate([dxs, dxT[None]], axis=0)
    return K, kff, L, Pc, dx_all, dus


# ---------------------------------------------------------------------------
# windowed (split) c2 sweeps for LONG horizons: no O(M) VMEM gain scratch
# ---------------------------------------------------------------------------
#
# The fused two-phase sweeps park the whole horizon's (K, kff) in VMEM so
# the forward phase can replay them without touching HBM — an O(M) scratch
# term that caps the single-chip horizon (ipm_fast._c2_vmem_clamp).  Past
# that envelope these split launches run backward and forward as SEPARATE
# kernels: gains go to HBM (they are solver outputs anyway) and the
# forward launch streams them back per stage block.  VMEM is then O(ms)
# only, so any horizon that fits HBM runs on one chip; the price is one
# extra launch per sweep plus the K/kff round trip (~25% of sweep bytes).


def _bwd_c2_kernel(ms, A_ref, B_ref, c_ref, Q_ref, S1T_ref, R00_ref,
                   qx_ref, ruu_ref, ru_ref, Pt_ref, pt_ref,
                   K_out, kff_out, L_out, Pc_out, P_scr, p_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        eye = jnp.eye(NX, dtype=Pt_ref.dtype)[:, :, None]
        P_scr[:] = eye * Pt_ref[:][None, :, :]
        p_scr[:] = pt_ref[:]

    for j in range(ms - 1, -1, -1):
        A = A_ref[j]
        Bm = B_ref[j]
        c = c_ref[j]
        P = P_scr[:]
        p = p_scr[:]
        PA = _mm(P, A, NX, NX, NX)
        PB = _mm(P, Bm, NX, NX, NUC)
        Pc = _mv(P, c, NX, NX)
        m = p + Pc
        BtPB = _mtm(Bm, PB, NX, NUC, NUC)
        z44 = jnp.zeros_like(R00_ref[j])
        R00p = jnp.concatenate([
            jnp.concatenate([R00_ref[j], z44], axis=1),
            jnp.concatenate([z44, z44], axis=1)], axis=0)
        Quu = _add_diag(BtPB + R00p, ruu_ref[j], NUC)
        S1T = S1T_ref[j]
        SxT = jnp.concatenate([S1T, jnp.zeros_like(S1T)], axis=0)
        Qux = SxT + _mtm(Bm, PA, NX, NUC, NX)
        Qu = ru_ref[j] + _mtv(Bm, m, NX, NUC)

        L = _chol_n(Quu, NUC)
        K = -_cho_solve_n(L, Qux, NUC, NX)
        kff = -_cho_solve_n_vec(L, Qu, NUC)

        APA = _mtm(A, PA, NX, NX, NX)
        QK = _mtm(Qux, K, NUC, NX, NX)
        P_new = Q_ref[j] + APA + QK
        P_scr[:] = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
        p_scr[:] = qx_ref[j] + _mtv(A, m, NX, NX) + _mtv(K, Qu, NUC, NX)

        K_out[j] = K
        kff_out[j] = kff
        L_out[j] = L
        Pc_out[j] = Pc


def _bwd_vec_c2_kernel(ms, A_ref, B_ref, qx_ref, ru_ref, K_ref, L_ref,
                       Pc_ref, pt_ref, kff_out, p_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        p_scr[:] = pt_ref[:]

    for j in range(ms - 1, -1, -1):
        p = p_scr[:]
        m = p + Pc_ref[j]
        Qu = ru_ref[j] + _mtv(B_ref[j], m, NX, NUC)
        kff = -_cho_solve_n_vec(L_ref[j], Qu, NUC)
        p_scr[:] = (qx_ref[j] + _mtv(A_ref[j], m, NX, NX)
                    + _mtv(K_ref[j], Qu, NUC, NX))
        kff_out[j] = kff


def _fwd_c2_kernel(ms, A_ref, B_ref, c_ref, K_ref, kff_ref, dx0_ref,
                   dx_out, du_out, dxT_out, dx_scr):
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        dx_scr[:] = dx0_ref[:]

    for j in range(ms):
        dx = dx_scr[:]
        du = _mv(K_ref[j], dx, NUC, NX) + kff_ref[j]
        dx_out[j] = dx
        du_out[j] = du
        dx_scr[:] = (_mv(A_ref[j], dx, NX, NX)
                     + _mv(B_ref[j], du, NX, NUC) + c_ref[j])
    dxT_out[:] = dx_scr[:]


def _win_specs(ms, block_b, ngrid, reverse):
    def mk(sp):
        def idx(b, n):
            return ((ngrid - 1 - n) if reverse else n,
                    ) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def const(sp):
        def idx(b, n):
            return (0,) * len(sp) + (b,)
        return pl.BlockSpec(sp + (block_b,), idx, memory_space=pltpu.VMEM)
    return mk, const


def kkt_sweep_c2_win(Abar, Bbar, cbar, Qbar, S1T, R00, qx, ruu_shift, ru,
                     pT_dense_diag, p_term, dx0, block_b: int = 128,
                     stages_per_step: int = 5, interpret: bool = False):
    """Windowed equivalent of `kkt_sweep_c2`: backward factorization and
    forward rollout as two launches with gains streamed through HBM —
    O(ms) VMEM, so horizons past the fused envelope run single-chip."""
    M, _, Btot = cbar.shape
    dtype = cbar.dtype
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    ngrid = M // ms
    rev, const = _win_specs(ms, block_b, ngrid, reverse=True)
    fwd, _ = _win_specs(ms, block_b, ngrid, reverse=False)

    K, kff, L, Pc = pl.pallas_call(
        _ft.partial(_bwd_c2_kernel, ms),
        grid=(nb, ngrid),
        in_specs=[rev((NX, NX)), rev((NX, NUC)), rev((NX,)),
                  rev((NX, NX)), rev((NU, NX)), rev((NU, NU)),
                  rev((NX,)), rev((NUC,)), rev((NUC,)),
                  const((NX,)), const((NX,))],
        out_specs=(rev((NUC, NX)), rev((NUC,)), rev((NLC,)), rev((NX,))),
        out_shape=(jax.ShapeDtypeStruct((M, NUC, NX, Btot), dtype),
                   jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
                   jax.ShapeDtypeStruct((M, NLC, Btot), dtype),
                   jax.ShapeDtypeStruct((M, NX, Btot), dtype)),
        scratch_shapes=[pltpu.VMEM((NX, NX, block_b), dtype),
                        pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(Abar, Bbar, cbar, Qbar, S1T, R00, qx, ruu_shift, ru,
      pT_dense_diag, p_term)

    dxs, dus, dxT = pl.pallas_call(
        _ft.partial(_fwd_c2_kernel, ms),
        grid=(nb, ngrid),
        in_specs=[fwd((NX, NX)), fwd((NX, NUC)), fwd((NX,)),
                  fwd((NUC, NX)), fwd((NUC,)), const((NX,))],
        out_specs=(fwd((NX,)), fwd((NUC,)), const((NX,))),
        out_shape=(jax.ShapeDtypeStruct((M, NX, Btot), dtype),
                   jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
                   jax.ShapeDtypeStruct((NX, Btot), dtype)),
        scratch_shapes=[pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(Abar, Bbar, cbar, K, kff, dx0)
    dx_all = jnp.concatenate([dxs, dxT[None]], axis=0)
    return K, kff, L, Pc, dx_all, dus


def corrector_sweep_c2_win(Abar, Bbar, cbar, qx, ru, K, L, Pc, p_term,
                           dx0, block_b: int = 128,
                           stages_per_step: int = 5,
                           interpret: bool = False):
    """Windowed equivalent of `corrector_sweep_c2` (see kkt_sweep_c2_win)."""
    M, _, Btot = cbar.shape
    dtype = cbar.dtype
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    ngrid = M // ms
    rev, const = _win_specs(ms, block_b, ngrid, reverse=True)
    fwd, _ = _win_specs(ms, block_b, ngrid, reverse=False)

    kff = pl.pallas_call(
        _ft.partial(_bwd_vec_c2_kernel, ms),
        grid=(nb, ngrid),
        in_specs=[rev((NX, NX)), rev((NX, NUC)), rev((NX,)),
                  rev((NUC,)), rev((NUC, NX)), rev((NLC,)), rev((NX,)),
                  const((NX,))],
        out_specs=rev((NUC,)),
        out_shape=jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
        scratch_shapes=[pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(Abar, Bbar, qx, ru, K, L, Pc, p_term)

    dxs, dus, dxT = pl.pallas_call(
        _ft.partial(_fwd_c2_kernel, ms),
        grid=(nb, ngrid),
        in_specs=[fwd((NX, NX)), fwd((NX, NUC)), fwd((NX,)),
                  fwd((NUC, NX)), fwd((NUC,)), const((NX,))],
        out_specs=(fwd((NX,)), fwd((NUC,)), const((NX,))),
        out_shape=(jax.ShapeDtypeStruct((M, NX, Btot), dtype),
                   jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
                   jax.ShapeDtypeStruct((NX, Btot), dtype)),
        scratch_shapes=[pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(Abar, Bbar, cbar, K, kff, dx0)
    dx_all = jnp.concatenate([dxs, dxT[None]], axis=0)
    return dx_all, dus


# ---------------------------------------------------------------------------
# whole-IPM-iteration kernel: ONE launch per Mehrotra iteration
# ---------------------------------------------------------------------------
#
# Five grid phases over the condensed horizon (G = M/ms grid steps each):
#   0  backward-affine:    barrier shift + affine RHS computed in-kernel
#                          (sig = lam/s, rt1u), dense-cost Riccati
#                          factorization; K/kff/L/Pc parked in VMEM scratch
#                          (they never touch HBM)
#   1  forward-affine:     du_aff rollout + slack/dual directions, running
#                          fraction-to-boundary min and the mu_aff sums
#                          S0/S1/S2 (mu_aff(a) = (S0 + a S1 + a^2 S2)/n)
#                          -> epilogue computes alpha_aff, sigma, sigma*mu
#   2  backward-corrector: Mehrotra-corrected RHS (r5 - sigma mu + ds dlam)
#                          computed per stage from du_aff, vector pass on
#                          the stored factorization
#   3  forward-corrector:  du rollout + final directions, fraction-to-
#                          boundary with tau -> epilogue computes alpha
#                          (with the mu-floor guard)
#   4  update:             z += alpha d, s/lam += alpha d, residual shrink
#                          by (1 - alpha) — all carried arrays updated
#                          in place (input_output_aliases)
#
# This removes every piece of per-iteration XLA glue (measured ~0.3 ms of
# a ~2.0 ms iteration at B=4096) and the K/L/Pc HBM round trip.  The
# masked-bound algebra relies on the ops.ipm invariants s=1, lam=0 at
# non-finite bounds (preserved by the in-kernel update), with explicit
# mask factors only where a masked entry would otherwise be nonzero
# (ds, the corrected r5 terms, dlam_corrector).


def _iter_c2_kernel(ms, G, tau, mu_floor, tiny,
                    A_ref, B_ref, c_ref, Q_ref, S1T_ref, R00_ref,
                    qx_ref, ruu_ref, r1u_ref,
                    sl_ref, su_ref, ll_ref, lu_ref, r3_ref, r4_ref,
                    ml_ref, mu_ref, zdx_ref, zdu_ref,
                    Pt_ref, r1xT_ref, dx0_ref, zdxT_ref,
                    nineq_ref, hasineq_ref,
                    zdx_out, zdu_out, sl_out, su_out, ll_out, lu_out,
                    qx_out, r1u_out, c_out, r3_out, r4_out,
                    r1xT_out, dx0_out, zdxT_out, alpha_out, muo_out,
                    P_scr, p_scr, K_all, kff_all, L_all, Pc_all,
                    dua_all, du_all, ddx_all, dx_scr, acc):
    n = pl.program_id(1)
    ph = n // G
    r = n % G
    BIG = jnp.asarray(3.4e38, A_ref.dtype)

    def corrected_r5(j, base, sigmu):
        """(r5c_l, r5c_u) for block-row j (global stage base+j) from the
        stored affine du."""
        s_l, s_u = sl_ref[j], su_ref[j]
        l_l, l_u = ll_ref[j], lu_ref[j]
        du_a = dua_all[pl.dslice(base + j, 1)][0]
        ds_l_a = ml_ref[j] * (du_a + r3_ref[j])
        ds_u_a = mu_ref[j] * (r4_ref[j] - du_a)
        dl_l_a = -(l_l * s_l + l_l * ds_l_a) / s_l
        dl_u_a = -(l_u * s_u + l_u * ds_u_a) / s_u
        r5c_l = l_l * s_l - sigmu + ds_l_a * dl_l_a
        r5c_u = l_u * s_u - sigmu + ds_u_a * dl_u_a
        return r5c_l, r5c_u

    @pl.when(n == 0)
    def _():
        eye = jnp.eye(NX, dtype=Pt_ref.dtype)[:, :, None]
        P_scr[:] = eye * Pt_ref[:][None, :, :]
        p_scr[:] = r1xT_ref[:]
        acc[0] = jnp.zeros_like(acc[0])          # S0 (sum lam s)
        acc[1] = jnp.zeros_like(acc[1])          # S1
        acc[2] = jnp.zeros_like(acc[2])          # S2
        acc[3] = jnp.full_like(acc[3], BIG)      # min ratio (affine)

    @pl.when(ph == 0)
    def _backward_affine():
        base = (G - 1 - r) * ms
        for j in range(ms - 1, -1, -1):
            A = A_ref[j]
            Bm = B_ref[j]
            s_l, s_u = sl_ref[j], su_ref[j]
            l_l, l_u = ll_ref[j], lu_ref[j]
            # in-kernel barrier algebra (XLA glue phase A)
            r5l = l_l * s_l
            r5u = l_u * s_u
            acc[0] += jnp.sum(r5l + r5u, axis=0)
            ruu_shift = ruu_ref[j] + l_l / s_l + l_u / s_u
            rt1u = (r1u_ref[j] + (r5l + l_l * r3_ref[j]) / s_l
                    - (r5u + l_u * r4_ref[j]) / s_u)

            P = P_scr[:]
            p = p_scr[:]
            PA = _mm(P, A, NX, NX, NX)
            PB = _mm(P, Bm, NX, NX, NUC)
            Pc = _mv(P, c_ref[j], NX, NX)
            m = p + Pc
            BtPB = _mtm(Bm, PB, NX, NUC, NUC)
            z44 = jnp.zeros_like(R00_ref[j])
            R00p = jnp.concatenate([
                jnp.concatenate([R00_ref[j], z44], axis=1),
                jnp.concatenate([z44, z44], axis=1)], axis=0)
            Quu = _add_diag(BtPB + R00p, ruu_shift, NUC)
            S1T = S1T_ref[j]
            SxT = jnp.concatenate([S1T, jnp.zeros_like(S1T)], axis=0)
            Qux = SxT + _mtm(Bm, PA, NX, NUC, NX)
            Qu = rt1u + _mtv(Bm, m, NX, NUC)

            L = _chol_n(Quu, NUC)
            K = -_cho_solve_n(L, Qux, NUC, NX)
            kff = -_cho_solve_n_vec(L, Qu, NUC)

            APA = _mtm(A, PA, NX, NX, NX)
            QK = _mtm(Qux, K, NUC, NX, NX)
            P_new = Q_ref[j] + APA + QK
            P_new = 0.5 * (P_new + jnp.swapaxes(P_new, 0, 1))
            p_new = (qx_ref[j] + _mtv(A, m, NX, NX)
                     + _mtv(K, Qu, NUC, NX))

            K_all[pl.dslice(base + j, 1)] = K[None]
            kff_all[pl.dslice(base + j, 1)] = kff[None]
            L_all[pl.dslice(base + j, 1)] = L[None]
            Pc_all[pl.dslice(base + j, 1)] = Pc[None]
            P_scr[:] = P_new
            p_scr[:] = p_new

    @pl.when(n == G)
    def _():
        dx_scr[:] = dx0_ref[:]

    @pl.when(ph == 1)
    def _forward_affine():
        base = r * ms
        for j in range(ms):
            dx = dx_scr[:]
            K = K_all[pl.dslice(base + j, 1)][0]
            kff = kff_all[pl.dslice(base + j, 1)][0]
            du_a = _mv(K, dx, NUC, NX) + kff
            dua_all[pl.dslice(base + j, 1)] = du_a[None]
            dx_scr[:] = (_mv(A_ref[j], dx, NX, NX)
                         + _mv(B_ref[j], du_a, NX, NUC) + c_ref[j])

            # slack/dual directions + running reductions (XLA glue B)
            s_l, s_u = sl_ref[j], su_ref[j]
            l_l, l_u = ll_ref[j], lu_ref[j]
            ds_l = ml_ref[j] * (du_a + r3_ref[j])
            ds_u = mu_ref[j] * (r4_ref[j] - du_a)
            dl_l = -(l_l * s_l + l_l * ds_l) / s_l
            dl_u = -(l_u * s_u + l_u * ds_u) / s_u
            acc[1] += jnp.sum(l_l * ds_l + s_l * dl_l
                              + l_u * ds_u + s_u * dl_u, axis=0)
            acc[2] += jnp.sum(dl_l * ds_l + dl_u * ds_u, axis=0)
            ratio = jnp.full_like(ds_l, BIG)
            for v, dv in ((s_l, ds_l), (s_u, ds_u), (l_l, dl_l),
                          (l_u, dl_u)):
                ratio = jnp.minimum(
                    ratio, jnp.where(dv < 0,
                                     -v / jnp.where(dv < 0, dv, -1.0),
                                     BIG))
            acc[3] = jnp.minimum(acc[3], jnp.min(ratio, axis=0))

        @pl.when(r == G - 1)
        def _epilogue_affine():
            n_ineq = nineq_ref[0]
            mu = acc[0] / n_ineq
            a = jnp.minimum(1.0, acc[3])
            mu_aff = (acc[0] + a * acc[1] + a * a * acc[2]) / n_ineq
            sig = mu_aff / jnp.maximum(mu, tiny)
            sig = jnp.clip(sig * sig * sig, 0.0, 1.0)
            acc[4] = sig * mu                      # sigma*mu for the RHS
            acc[6] = mu
            muo_out[0] = mu
            acc[3] = jnp.full_like(acc[3], BIG)    # reuse for corrector

    @pl.when(n == 2 * G)
    def _():
        p_scr[:] = r1xT_ref[:]

    @pl.when(ph == 2)
    def _backward_corrector():
        base = (G - 1 - r) * ms
        sigmu = acc[4][None, :]
        for j in range(ms - 1, -1, -1):
            r5c_l, r5c_u = corrected_r5(j, base, sigmu)
            rt1u_c = (r1u_ref[j]
                      + ml_ref[j] * (r5c_l + ll_ref[j] * r3_ref[j])
                      / sl_ref[j]
                      - mu_ref[j] * (r5c_u + lu_ref[j] * r4_ref[j])
                      / su_ref[j])
            p = p_scr[:]
            m = p + Pc_all[pl.dslice(base + j, 1)][0]
            Qu = rt1u_c + _mtv(B_ref[j], m, NX, NUC)
            L = L_all[pl.dslice(base + j, 1)][0]
            kff = -_cho_solve_n_vec(L, Qu, NUC)
            K = K_all[pl.dslice(base + j, 1)][0]
            p_scr[:] = (qx_ref[j] + _mtv(A_ref[j], m, NX, NX)
                        + _mtv(K, Qu, NUC, NX))
            kff_all[pl.dslice(base + j, 1)] = kff[None]

    @pl.when(n == 3 * G)
    def _():
        dx_scr[:] = dx0_ref[:]

    @pl.when(ph == 3)
    def _forward_corrector():
        base = r * ms
        sigmu = acc[4][None, :]
        for j in range(ms):
            dx = dx_scr[:]
            K = K_all[pl.dslice(base + j, 1)][0]
            kff = kff_all[pl.dslice(base + j, 1)][0]
            du = _mv(K, dx, NUC, NX) + kff
            ddx_all[pl.dslice(base + j, 1)] = dx[None]
            du_all[pl.dslice(base + j, 1)] = du[None]
            dx_scr[:] = (_mv(A_ref[j], dx, NX, NX)
                         + _mv(B_ref[j], du, NX, NUC) + c_ref[j])

            s_l, s_u = sl_ref[j], su_ref[j]
            l_l, l_u = ll_ref[j], lu_ref[j]
            r5c_l, r5c_u = corrected_r5(j, base, sigmu)
            ds_l = ml_ref[j] * (du + r3_ref[j])
            ds_u = mu_ref[j] * (r4_ref[j] - du)
            dl_l = -ml_ref[j] * (r5c_l + l_l * ds_l) / s_l
            dl_u = -mu_ref[j] * (r5c_u + l_u * ds_u) / s_u
            ratio = jnp.full_like(ds_l, BIG)
            for v, dv in ((s_l, ds_l), (s_u, ds_u), (l_l, dl_l),
                          (l_u, dl_u)):
                ratio = jnp.minimum(
                    ratio, jnp.where(dv < 0,
                                     -v / jnp.where(dv < 0, dv, -1.0),
                                     BIG))
            acc[3] = jnp.minimum(acc[3], jnp.min(ratio, axis=0))

        @pl.when(r == G - 1)
        def _epilogue_corrector():
            alpha = jnp.minimum(1.0, tau * acc[3])
            guard = (hasineq_ref[0] > 0) & (acc[6] <= mu_floor)
            alpha = jnp.where(guard, 0.0, alpha)
            acc[5] = alpha
            alpha_out[0] = alpha

    @pl.when(ph == 4)
    def _update():
        base = r * ms
        alpha = acc[5][None, :]
        shrink = 1.0 - alpha
        sigmu = acc[4][None, :]
        for j in range(ms):
            du = du_all[pl.dslice(base + j, 1)][0]
            s_l, s_u = sl_ref[j], su_ref[j]
            l_l, l_u = ll_ref[j], lu_ref[j]
            r5c_l, r5c_u = corrected_r5(j, base, sigmu)
            ds_l = ml_ref[j] * (du + r3_ref[j])
            ds_u = mu_ref[j] * (r4_ref[j] - du)
            dl_l = -ml_ref[j] * (r5c_l + l_l * ds_l) / s_l
            dl_u = -mu_ref[j] * (r5c_u + l_u * ds_u) / s_u

            zdx_out[j] = zdx_ref[j] + alpha * ddx_all[
                pl.dslice(base + j, 1)][0]
            zdu_out[j] = zdu_ref[j] + alpha * du
            sl_out[j] = s_l + alpha * ds_l
            su_out[j] = s_u + alpha * ds_u
            ll_out[j] = l_l + alpha * dl_l
            lu_out[j] = l_u + alpha * dl_u
            qx_out[j] = shrink * qx_ref[j]
            r1u_out[j] = shrink * r1u_ref[j]
            c_out[j] = shrink * c_ref[j]
            r3_out[j] = shrink * r3_ref[j]
            r4_out[j] = shrink * r4_ref[j]

        @pl.when(r == G - 1)
        def _epilogue_update():
            alpha1 = acc[5][None, :]
            shr = 1.0 - alpha1
            zdxT_out[:] = zdxT_ref[:] + alpha1 * dx_scr[:]
            r1xT_out[:] = shr * r1xT_ref[:]
            dx0_out[:] = shr * dx0_ref[:]


def iter_sweep_c2(Abar, Bbar, c_res, Qbar, S1T, R00, qx, ruu, r1u,
                  s_l, s_u, lam_l, lam_u, r3, r4, m_l, m_u,
                  z_dx, z_du, pT_diag, r1x_T, dx0_res, z_dxT,
                  n_ineq, has_ineq, tau: float,
                  block_b: int = 128, stages_per_step: int = 5,
                  interpret: bool = False, alias: bool = True):
    """One full Mehrotra IPM iteration on the condensed problem as ONE
    Pallas launch (see the phase map above).  All carried (M,*,B) arrays
    come back updated; z_dxT/r1x_T/dx0_res are the terminal-row carries.

    Masked (non-finite) bounds follow the ops.ipm invariants: s=1, lam=0,
    r3=r4=0 and mask factors m_l/m_u in {0,1}; the update phase preserves
    them.  Returns the updated carries + (alpha, mu) lane vectors.
    """
    M, _, Btot = c_res.shape
    dtype = c_res.dtype
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    G = M // ms

    def mk(sp, idx_of_n):
        def idx(b, n):
            return (idx_of_n(n),) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    def bwd_fwd(n):
        p = n // G
        r = n % G
        return jnp.where((p == 0) | (p == 2), G - 1 - r, r)

    both = lambda sp: mk(sp, bwd_fwd)
    bwd0 = lambda sp: mk(sp, lambda n: jnp.where(n // G == 0,
                                                 G - 1 - (n % G), 0))
    upd = lambda sp: mk(sp, lambda n: jnp.where(n // G == 4, n % G, 0))

    def spec_const(sp):
        def idx(b, n):
            return (0,) * len(sp) + (b,)
        return pl.BlockSpec(sp + (block_b,), idx, memory_space=pltpu.VMEM)

    in_specs = [
        both((NX, NX)),        # 0 Abar
        both((NX, NUC)),       # 1 Bbar
        both((NX,)),           # 2 c_res
        bwd0((NX, NX)),        # 3 Qbar
        bwd0((NU, NX)),        # 4 S1T
        bwd0((NU, NU)),        # 5 R00
        both((NX,)),           # 6 qx (r1x main)
        bwd0((NUC,)),          # 7 ruu
        both((NUC,)),          # 8 r1u
        both((NUC,)),          # 9 s_l
        both((NUC,)),          # 10 s_u
        both((NUC,)),          # 11 lam_l
        both((NUC,)),          # 12 lam_u
        both((NUC,)),          # 13 r3
        both((NUC,)),          # 14 r4
        both((NUC,)),          # 15 m_l
        both((NUC,)),          # 16 m_u
        upd((NX,)),            # 17 z_dx
        upd((NUC,)),           # 18 z_du
        spec_const((NX,)),     # 19 pT
        spec_const((NX,)),     # 20 r1x_T
        spec_const((NX,)),     # 21 dx0_res
        spec_const((NX,)),     # 22 z_dxT
        spec_const((1,)),      # 23 n_ineq
        spec_const((1,)),      # 24 has_ineq
    ]
    out_specs = (
        upd((NX,)), upd((NUC,)),                      # z_dx, z_du
        upd((NUC,)), upd((NUC,)), upd((NUC,)), upd((NUC,)),  # s/lam
        upd((NX,)), upd((NUC,)), upd((NX,)),          # qx, r1u, c_res
        upd((NUC,)), upd((NUC,)),                     # r3, r4
        spec_const((NX,)), spec_const((NX,)), spec_const((NX,)),
        spec_const((1,)), spec_const((1,)),           # alpha, mu
    )
    zs = lambda *sp: jax.ShapeDtypeStruct(sp + (Btot,), dtype)
    out_shape = (
        zs(M, NX), zs(M, NUC),
        zs(M, NUC), zs(M, NUC), zs(M, NUC), zs(M, NUC),
        zs(M, NX), zs(M, NUC), zs(M, NX),
        zs(M, NUC), zs(M, NUC),
        zs(NX), zs(NX), zs(NX),
        zs(1), zs(1),
    )
    scratch = [
        pltpu.VMEM((NX, NX, block_b), dtype),        # P
        pltpu.VMEM((NX, block_b), dtype),            # p
        pltpu.VMEM((M, NUC, NX, block_b), dtype),    # K_all
        pltpu.VMEM((M, NUC, block_b), dtype),        # kff_all
        pltpu.VMEM((M, NLC, block_b), dtype),        # L_all
        pltpu.VMEM((M, NX, block_b), dtype),         # Pc_all
        pltpu.VMEM((M, NUC, block_b), dtype),        # du_aff
        pltpu.VMEM((M, NUC, block_b), dtype),        # du
        pltpu.VMEM((M, NX, block_b), dtype),         # ddx
        pltpu.VMEM((NX, block_b), dtype),            # dx carry
        pltpu.VMEM((8, block_b), dtype),             # accumulators
    ]
    aliases = {17: 0, 18: 1, 9: 2, 10: 3, 11: 4, 12: 5,
               6: 6, 8: 7, 2: 8, 13: 9, 14: 10,
               20: 11, 21: 12, 22: 13} if alias else {}
    mu_floor = 100.0 * float(jnp.finfo(dtype).eps) ** 2
    tiny = float(jnp.finfo(dtype).tiny)
    outs = pl.pallas_call(
        _ft.partial(_iter_c2_kernel, ms, G, tau, mu_floor, tiny),
        grid=(nb, 5 * G),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        interpret=interpret,
    )(Abar, Bbar, c_res, Qbar, S1T, R00, qx, ruu, r1u,
      s_l, s_u, lam_l, lam_u, r3, r4, m_l, m_u, z_dx, z_du,
      pT_diag, r1x_T, dx0_res, z_dxT,
      n_ineq.reshape(1, Btot).astype(dtype),
      has_ineq.reshape(1, Btot).astype(dtype))
    return outs


# ---------------------------------------------------------------------------
# fused corrector sweep on the condensed problem
# ---------------------------------------------------------------------------

def _corr_c2_kernel(ms, ngrid, ablate, a_dev, A_ref, B_ref, c_ref, qx_ref,
                    ru_ref, K_ref, L_ref, Pc_ref, pt_ref, dx0_ref,
                    dx_out, du_out, dxT_out, p_scr, kff_all, K_all,
                    dx_scr):
    # `ablate` is MEASUREMENT-ONLY — see _kkt_c2_kernel.  A/B/c and
    # K/L/Pc may arrive bf16-compressed (module-top note): loads upcast
    # to the compute dtype; K is parked in scratch at its STORED dtype so
    # compressed gains also halve the forward-phase VMEM footprint.
    n = pl.program_id(1)
    cdt = qx_ref.dtype         # compute dtype (qx is never compressed)
    eye_a = _eye_nx(cdt) if a_dev else None

    @pl.when(n == 0)
    def _():
        p_scr[:] = pt_ref[:]

    @pl.when(n < ngrid)
    def _backward_phase():
        base = (ngrid - 1 - n) * ms
        for j in range(ms - 1, -1, -1):
            A = _ld_A(A_ref, j, cdt, a_dev, eye_a)
            Bm = _ld(B_ref[j], cdt)
            K_raw = K_ref[j]
            K = _ld(K_raw, cdt)
            p = p_scr[:]
            m = p + _ld(Pc_ref[j], cdt)
            Qu = (ru_ref[j] if "Qu" in ablate
                  else ru_ref[j] + _mtv(Bm, m, NX, NUC))
            kff = -Qu if "solve" in ablate else -_cho_solve_n_vec(
                _ld(L_ref[j], cdt), Qu, NUC)
            if "pnew" in ablate:
                p_new = qx_ref[j] + m
            else:
                p_new = (qx_ref[j] + _mtv(A, m, NX, NX)
                         + _mtv(K, Qu, NUC, NX))
            kff_all[pl.dslice(base + j, 1)] = kff[None]
            # park K for the forward phase: this kernel is at the HBM
            # streaming floor (round-4 SoL ablation), so re-streaming K
            # through the forward `both` spec was 12% of its bytes; the
            # VMEM cost equals the kkt kernel's own K_all scratch, so the
            # shared envelope clamp is unchanged
            K_all[pl.dslice(base + j, 1)] = K_raw[None]
            p_scr[:] = p_new

    @pl.when(n == ngrid)
    def _():
        dx_scr[:] = dx0_ref[:]

    @pl.when(n >= ngrid)
    def _forward_phase():
        base = (n - ngrid) * ms
        for j in range(ms):
            dx = dx_scr[:]
            kff = kff_all[pl.dslice(base + j, 1)][0]
            if "fwd" in ablate:
                du = kff
                dx_next = dx + _ld(c_ref[j], cdt)
            else:
                K = _ld(K_all[pl.dslice(base + j, 1)][0], cdt)
                du = _mv(K, dx, NUC, NX) + kff
                dx_next = (_mv(_ld_A(A_ref, j, cdt, a_dev, eye_a), dx,
                               NX, NX)
                           + _mv(_ld(B_ref[j], cdt), du, NX, NUC)
                           + _ld(c_ref[j], cdt))
            dx_out[j] = dx
            du_out[j] = du
            dx_scr[:] = dx_next
        # terminal state (last grid step's write wins) — see _kkt_c2_kernel
        dxT_out[:] = dx_scr[:]


def corrector_sweep_c2(Abar, Bbar, cbar, qx, ru, K, L, Pc, p_term, dx0,
                       block_b: int = 128, stages_per_step: int = 5,
                       interpret: bool = False,
                       ablate: frozenset = frozenset(),
                       a_dev: bool = False):
    """Vector backward pass + forward rollout with the stored condensed
    factorization.  Returns (dx (M+1,13,·), du (M,8,·)).

    Abar/Bbar/cbar and K/L/Pc may be bf16-compressed streams (module-top
    note); a_dev marks Abar as deviation-coded (Abar − I)."""
    M = Abar.shape[0]
    Btot = Abar.shape[-1]
    dtype = qx.dtype
    ms = stages_per_step
    while M % ms != 0:
        ms -= 1
    nb = Btot // block_b
    ngrid = M // ms

    def mk_spec(sp, idx_of_n):
        def idx(b, n):
            return (idx_of_n(n),) + (0,) * len(sp) + (b,)
        return pl.BlockSpec((ms,) + sp + (block_b,), idx,
                            memory_space=pltpu.VMEM)

    both = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, n - ngrid))
    bwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, ngrid - 1 - n, 0))
    fwd = lambda sp: mk_spec(
        sp, lambda n: jnp.where(n < ngrid, 0, n - ngrid))

    def spec_const(sp):
        def idx(b, n):
            return (0,) * len(sp) + (b,)
        return pl.BlockSpec(sp + (block_b,), idx, memory_space=pltpu.VMEM)

    dxs, dus, dxT = pl.pallas_call(
        _ft.partial(_corr_c2_kernel, ms, ngrid, ablate, a_dev),
        grid=(nb, 2 * ngrid),
        in_specs=[both((NX, NX)), both((NX, NUC)), fwd((NX,)),
                  bwd((NX,)), bwd((NUC,)), bwd((NUC, NX)), bwd((NLC,)),
                  bwd((NX,)), spec_const((NX,)), spec_const((NX,))],
        out_specs=(fwd((NX,)), fwd((NUC,)), spec_const((NX,))),
        out_shape=(jax.ShapeDtypeStruct((M, NX, Btot), dtype),
                   jax.ShapeDtypeStruct((M, NUC, Btot), dtype),
                   jax.ShapeDtypeStruct((NX, Btot), dtype)),
        scratch_shapes=[pltpu.VMEM((NX, block_b), dtype),
                        pltpu.VMEM((M, NUC, block_b), dtype),
                        # K parks at its STORED dtype — bf16 gains halve
                        # this scratch term too
                        pltpu.VMEM((M, NUC, NX, block_b), K.dtype),
                        pltpu.VMEM((NX, block_b), dtype)],
        interpret=interpret,
    )(Abar, Bbar, cbar, qx, ru, K, L, Pc, p_term, dx0)
    dx_all = jnp.concatenate([dxs, dxT[None]], axis=0)
    return dx_all, dus
