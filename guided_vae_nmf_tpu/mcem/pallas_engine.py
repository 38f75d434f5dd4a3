"""Fused Metropolis-Hastings chain kernel (Pallas/TPU) + batched MCEM engine.

The MH chain is the entire runtime cost of enhancement (SURVEY §3.2: ~4100
decoder microbatches per utterance). The XLA scan implementation streams the
(B, F, N) state arrays through HBM on EVERY chain step, which makes the loop
HBM-bandwidth-bound (~0.33 ms/step measured on v5e). This kernel keeps the
whole chain state resident in VMEM for all steps of a chain:

  * grid (B, N/T): each program owns a T-frame tile of one utterance —
    the MH accept is per-frame independent (reference mcem.py:271-280), so
    tiles never communicate;
  * frames-major (T, F) tiles: frames ride the sublane axis, frequency the
    lanes (a transposed (F, T) variant measured ~45% slower — the accept's
    per-frame reduction wants to run along lanes);
  * VMEM-resident per tile: decoder weights (~0.35 MB), the tile's power
    spectrogram, noise variance, gain, label projection, latent state,
    current speech variance and its carried log/reciprocal; HBM is touched
    once per chain for loads plus the (R, T, F) sample dump (E-mode) or two
    (T, F) accumulators (WF-mode);
  * the decoder forward runs on the MXU inside the kernel
    ((T,L)@(L,128) -> (T,128)@(128,128) -> (T,128)@(128,513), f32
    accumulate, optionally bf16 inputs);
  * 1/Vx and the row-summed data term s = Σ_f [log Vx + Vx⁻¹ X²] ride the
    loop carry so only the proposal's transcendentals are paid each step
    (the reference recomputes both sides, mcem.py:266-268), and the accept
    ratio needs no second full-array pass;
  * the burn-in phase runs a slim loop carrying only (Z, s) — the accepted
    Vs / 1/Vx arrays are dead until sampling starts — and Vs is re-derived
    from Z once at the phase boundary;
  * E-mode also accumulates the W-update sufficient statistics
    s1 = Σ_r Vx^-1 and s2 = Σ_r Vx^-2 in VMEM, skipping one full pass over
    the HBM sample buffer in the M-step;
  * proposals use the on-core PRNG (`pltpu.prng_random_bits`) with
    Box-Muller — a different (but equally valid) random stream than
    jax.random; the MCEM output distribution is unchanged.

Math parity: identical update equations and ordering as engine._mh_scan
(reference mcem.py:218-294); deterministic var_RW=0 sub-checks and
XLA-engine cross-checks in tests/mcem/test_pallas.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .engine import MCEMConfig, VX_FLOOR

_TWO_PI = 6.283185307179586


def _uniform01(shape):
    """Random bits -> float32 uniform in (0, 1).

    prng_random_bits returns signed int32 on TPU; mask to the low 23 bits
    (always non-negative under int32 arithmetic) before scaling.
    """
    bits = pltpu.prng_random_bits(shape)
    return (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23)) + (
        0.5 / (1 << 23)
    )


def _normal(shape):
    """Box-Muller standard normals from the on-core PRNG."""
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


_LN2 = 0.6931471805599453
_SQRT2 = 1.4142135623730951


def _fast_log(x):
    """Natural log of positive normal float32s via exponent extraction.

    log x = e*ln2 + log m with m in [sqrt(1/2), sqrt(2)); the mantissa log
    uses the odd atanh series 2s(1 + s^2/3 + s^4/5 + s^6/7), s =
    (m-1)/(m+1) in [-0.1716, 0.1716] (|rel err| < 2e-7). Everything is
    single-slot VPU ALU work (bitcasts, shifts, FMAs) instead of the
    transcendental unit — the MH chain's accept term is one log per bin
    per step, so this trades a serialized transcendental for pipelined
    lanes. Caller guarantees x >= VX_FLOOR (no zeros/denormals/NaNs).
    """
    bits = lax.bitcast_convert_type(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32)
    big = m > _SQRT2
    m = jnp.where(big, 0.5 * m, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    s = (m - 1.0) / (m + 1.0)
    s2 = s * s
    p = 2.0 * s * (1.0 + s2 * (0.33333333 + s2 * (0.2 + s2 * 0.14285714)))
    return e * _LN2 + p


def _fast_exp(x):
    """exp for float32 via exponent assembly: a rounded multiple of ln2 is
    bit-shifted into the exponent field and the Cody-Waite-reduced
    residual r in [-ln2/2, ln2/2] evaluated by a degree-6 Taylor
    (|rel err| < 3e-7). Input clamped to the finite range so the
    assembled exponent stays normal."""
    x = jnp.clip(x, -87.0, 88.0)
    zi = jnp.floor(x * (1.0 / _LN2) + 0.5)
    # two-constant reduction: ln2_hi exact in f32, so x - zi*ln2_hi is too
    r = (x - zi * 0.693359375) + zi * 2.12194440e-4
    p = 1.0 + r * (1.0 + r * (0.5 + r * (0.16666666666666666
        + r * (0.041666666666666664 + r * (0.008333333333333333
        + r * 0.001388888888888889)))))
    scale = lax.bitcast_convert_type(
        (zi.astype(jnp.int32) + 127) << 23, jnp.float32)
    return scale * p


def _make_chain_kernel(mode, n_steps, burnin, var_RW, T, L, F, depth=2,
                       samples_dtype=jnp.float32,
                       matmul_dtype=jnp.float32, approx_recip=False,
                       approx_trans=False, inject=False, nmf=False):
    """`depth` = number of decoder hidden layers (the reference family is
    tanh^depth -> exp; evaluate configs use 2, training_M1's default 1).

    `inject=True` swaps the on-core PRNG for precomputed noise streams
    passed as kernel inputs (proposal normals + accept uniforms) — the
    fixed-randomness test mode (SURVEY §7): identical streams fed to the
    XLA engine make the var_RW>0 trajectories bit-comparable on CPU,
    where the interpreter's PRNG is a stub.

    `nmf=True` switches the noise-variance source from a precomputed
    (T, F) Vb input to the NMF factors themselves: the kernel receives
    Wt (K, F) + an H tile (K, T) and forms its Vb tile on the MXU, so the
    (B, N, F) Vb never round-trips HBM. In E-mode it additionally
    contracts the W-update sufficient statistics with H in-kernel and
    emits num/den (K, F) directly (reference mcem.py:107-115) instead of
    the full (B, N, F) s1/s2 arrays."""
    sqrt_var = float(np.sqrt(var_RW))

    def recip(x):
        if approx_recip:
            return pl.reciprocal(x, approx=True)
        return 1.0 / x

    # approx_trans swaps the chain's two per-bin-per-step transcendentals
    # (the decoder-output exp and the data term's log) for exponent-field
    # bit arithmetic + short polynomials (<2e-7 rel) — ALU work the VPU
    # pipelines instead of serialized transcendental-unit issues.
    log_ = _fast_log if approx_trans else jnp.log
    exp_ = _fast_exp if approx_trans else jnp.exp

    def normal_(shape):
        # Box-Muller on the on-core PRNG; rides log_ so approx_trans also
        # covers the proposal draw's (T, L) logs (sqrt/cos stay native)
        u1 = _uniform01(shape)
        u2 = _uniform01(shape)
        return jnp.sqrt(-2.0 * log_(u1)) * jnp.cos(_TWO_PI * u2)

    def mm(a, b):
        return jnp.dot(a.astype(matmul_dtype), b.astype(matmul_dtype),
                       preferred_element_type=jnp.float32)

    def kernel(seed_ref, x2_ref, *rest):
        # rest = [vb] or [wt, hb(, mask in e-mode)], g, ypre, z, vs,
        #        [zn, u when inject,] w1, (w_i, b_i) x (depth-1),
        #        w_out, b_out, z_out, vs_out, extra...
        rest = list(rest)
        if nmf:
            wt_ref = rest.pop(0)
            hb_ref = rest.pop(0)
            if mode == "e":
                mask_ref = rest.pop(0)
        else:
            vb_ref = rest.pop(0)
        g_ref, ypre_ref, z_ref, vs_ref = rest[:4]
        rest = rest[4:]
        if inject:
            zn_ref, u_ref, *rest = rest
        n_w = 1 + 2 * (depth - 1) + 2
        w_refs = rest[:n_w]
        z_out_ref, vs_out_ref, *extra_refs = rest[n_w:]
        w1_ref = w_refs[0]
        mid = [(w_refs[1 + 2 * i], w_refs[2 + 2 * i])
               for i in range(depth - 1)]
        wo_ref, bo_ref = w_refs[-2], w_refs[-1]

        if not inject:
            pltpu.prng_seed(seed_ref[pl.program_id(0), pl.program_id(1)])
        X2 = x2_ref[0]          # (T, F)
        if nmf:
            Hb = hb_ref[0]      # (K, T)
            Wt = wt_ref[0]      # (K, F)
            # Vb tile = H^T W^T on the MXU (contract K on dim 0 of both)
            Vb = lax.dot_general(
                Hb, Wt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                   # (T, F)
        else:
            Vb = vb_ref[0]      # (T, F)
        G = g_ref[0]            # (T, 1) — column vector, broadcasts over F
        ypre = ypre_ref[0]      # (T, H1)

        if mode == "wf":
            acc_s_ref, acc_n_ref = extra_refs
            acc_s_ref[0] = jnp.zeros((T, F), jnp.float32)
            acc_n_ref[0] = jnp.zeros((T, F), jnp.float32)
        elif nmf:
            samp_ref, nw_ref, dw_ref = extra_refs
        else:
            samp_ref, s1_ref, s2_ref = extra_refs

        def nll_rowsum(logVx, invVx):
            # s_t = sum_f [log Vx + Vx^-1 * X2]: the per-frame data term of
            # the MH log-acceptance (reference mcem.py:414-417). acc =
            # s - s_proposal, so ONE carried (T, 1) column replaces the
            # carried log array + two full-array subtractions per step.
            # (An MXU ones-matmul rowsum variant measured ~1.5% slower than
            # the VPU cross-lane reduce.)
            return jnp.sum(logVx + invVx * X2, axis=1, keepdims=True)

        def decode(Zc):
            # jnp.tanh/exp/log stay native: the VPU's transcendentals are
            # fast on v5e — a Padé(7,6) rational tanh measured ~2.5% SLOWER
            # than jnp.tanh here, so polynomial replacements don't pay.
            h = jnp.tanh(mm(Zc, w1_ref[:]) + ypre)           # (T, H1)
            for w_ref, b_ref in mid:
                h = jnp.tanh(mm(h, w_ref[:]) + b_ref[:])
            return exp_(mm(h, wo_ref[:]) + bo_ref[:])        # (T, F)

        def propose(m, Z, s):
            """One MH proposal + accept decision. Returns (accept column,
            Zp, Vsp, invVxp, sp)."""
            if inject:
                zn_m = zn_ref[0, pl.ds(m, 1)].reshape(T, L)
            else:
                zn_m = normal_((T, L))
            Zp = Z + sqrt_var * zn_m
            Vsp = decode(Zp)
            Vxp = jnp.maximum(G * Vsp + Vb, VX_FLOOR)
            invVxp = recip(Vxp)
            sp = nll_rowsum(log_(Vxp), invVxp)               # (T, 1)
            acc = (s - sp)[:, 0] + 0.5 * jnp.sum(
                Z * Z - Zp * Zp, axis=1
            )                                                # (T,)
            if inject:
                u = u_ref[0, pl.ds(m, 1)].reshape(T)
            else:
                u = _uniform01((T, 1))[:, 0]
            return (log_(u) < acc)[:, None], Zp, Vsp, invVxp, sp

        def burn_body(m, carry):
            # Burn-in carries only (Z, s): the accepted Vs / 1/Vx arrays
            # are dead until sampling starts, so their per-step selects
            # are skipped and Vs is re-derived from Z once at the phase
            # boundary (the decoder is deterministic in Z).
            Z, s = carry
            accept, Zp, _, _, sp = propose(m, Z, s)
            return (jnp.where(accept, Zp, Z), jnp.where(accept, sp, s))

        def samp_body(m, carry):
            Z, Vs, invVx, s, s1, s2 = carry  # (T,L), (T,F)x2, (T,1), (T,F)x2
            accept, Zp, Vsp, invVxp, sp = propose(m + burnin, Z, s)
            Z = jnp.where(accept, Zp, Z)
            Vs = jnp.where(accept, Vsp, Vs)
            invVx = jnp.where(accept, invVxp, invVx)
            s = jnp.where(accept, sp, s)

            if mode == "wf":
                t = Vb * invVx
                acc_n_ref[0] += t
                acc_s_ref[0] += 1.0 - t
            else:
                samp_ref[0, pl.ds(m, 1)] = Vs[None].astype(samples_dtype)
                # W-update sufficient statistics at chain-time Vb
                # (engine.nmf_m_step's first sums): free here.
                s1 = s1 + invVx
                s2 = s2 + invVx * invVx

            return (Z, Vs, invVx, s, s1, s2)

        Vs0 = vs_ref[0]
        Vx0 = jnp.maximum(G * Vs0 + Vb, VX_FLOOR)
        Z, s = lax.fori_loop(
            0, burnin, burn_body,
            (z_ref[0], nll_rowsum(log_(Vx0), recip(Vx0))),
        )
        Vs = decode(Z)
        invVx = recip(jnp.maximum(G * Vs + Vb, VX_FLOOR))
        zf = jnp.zeros((T, F), jnp.float32)
        Z, Vs, _, _, s1, s2 = lax.fori_loop(
            0, n_steps - burnin, samp_body, (Z, Vs, invVx, s, zf, zf)
        )
        z_out_ref[0] = Z
        vs_out_ref[0] = Vs
        if mode == "e":
            if nmf:
                # Contract the W-update sums with the H tile on the MXU
                # (reference mcem.py:107-115: num = (X2 * s2 * mask) H^T,
                # den = (s1 * mask) H^T) and accumulate the (K, F) result
                # across frame tiles — the output block (b, 0, 0) stays
                # VMEM-resident for every t of a given b.
                mcol = mask_ref[0]                       # (T, 1)

                @pl.when(pl.program_id(1) == 0)
                def _():
                    nw_ref[0] = jnp.zeros_like(nw_ref[0])
                    dw_ref[0] = jnp.zeros_like(dw_ref[0])

                nw_ref[0] += jnp.dot(Hb, X2 * s2 * mcol,
                                     preferred_element_type=jnp.float32)
                dw_ref[0] += jnp.dot(Hb, s1 * mcol,
                                     preferred_element_type=jnp.float32)
            else:
                s1_ref[0] = s1
                s2_ref[0] = s2

    return kernel


def _default_interpret():
    """Pallas TPU kernels run interpreted on the CPU backend (tests /
    debugging); note the interpreter's PRNG is a stub, so only var_RW=0
    paths are meaningful there."""
    return jax.default_backend() == "cpu"


@functools.partial(
    jax.jit,
    static_argnames=("mode", "nsamples", "burnin", "var_RW", "tile",
                     "samples_dtype", "matmul_dtype", "interpret",
                     "approx_recip", "approx_trans"),
)
def mh_chain_pallas(dec_w, X2, Vb, g, ypre, Z, Vs, seeds, mode="e",
                    nsamples=10, burnin=30, var_RW=0.01, tile=128,
                    samples_dtype=jnp.float32, matmul_dtype=jnp.float32,
                    interpret=None, approx_recip=False, approx_trans=False,
                    noise=None, WH=None, mask=None):
    """Run the fused MH chain over a frames-major batch.

    Args (frames-major layout):
      dec_w: bundle from :func:`_dec_parts` — w1 (L, H1) (the z-rows of the
        decoder's first layer), mid = [(w_i, b_i), ...] for hidden layers
        2..depth, wo (H_last, F), bo (F,).
      X2, Vb, Vs: (B, N, F); g: (B, N); ypre: (B, N, H1); Z: (B, N, L);
      seeds: (B, N//tile) int32. `Vs` MUST be the decode of `Z` (every
      in-repo caller satisfies this): the kernel re-derives Vs = decode(Z)
      at the burn-in boundary while the initial MH data term comes from
      the caller's Vs, so an inconsistent pair would skew the accept
      ratio until the first acceptance.
      noise: optional (Zn (B, n_steps, N, L), U (B, n_steps, N)) recorded
        noise streams replacing the on-core PRNG (fixed-randomness test
        mode — lets CPU CI bit-check var_RW>0 chains against the XLA
        engine, whose _mh_scan accepts the same streams).
      WH: optional (Wt (B, K, F), H (B, K, N)) NMF factors. When given, Vb
        must be None: the kernel forms its own Vb tiles on the MXU (the
        (B, N, F) noise variance never touches HBM) and, in E-mode,
        contracts the W-update num/den with H in-kernel (`mask` (B, N)
        required: the W update is masked over pad frames, reference
        mcem.py:107-115).

    Returns (Z, Vs, extra): extra = (samples (B, nsamples, N, F), s1, s2)
    in 'e' mode with Vb, (samples, numW (B, K, F), denW (B, K, F)) in 'e'
    mode with WH, or (WFs_sum, WFn_sum) of (B, N, F) in 'wf' mode (divide
    by nsamples for the means).
    """
    B, N, F = X2.shape
    L = Z.shape[-1]
    H1 = ypre.shape[-1]
    depth = 1 + len(dec_w["mid"])
    assert N % tile == 0, (N, tile)
    nmf = WH is not None
    assert (Vb is None) == nmf, "pass exactly one of Vb / WH"
    n_tiles = N // tile
    n_steps = nsamples + burnin

    kernel = _make_chain_kernel(mode, n_steps, burnin, var_RW, tile, L, F,
                                depth=depth,
                                samples_dtype=samples_dtype,
                                matmul_dtype=matmul_dtype,
                                approx_recip=approx_recip,
                                approx_trans=approx_trans,
                                inject=noise is not None, nmf=nmf)

    def tiled(shape_tail):
        return pl.BlockSpec(
            (1,) + shape_tail,
            lambda b, t, *_: (b, t) + (0,) * (len(shape_tail) - 1),
            memory_space=pltpu.VMEM,
        )

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b, t, *_: (0,) * nd, memory_space=pltpu.VMEM
        )

    def per_b(shape_tail):
        return pl.BlockSpec(
            (1,) + shape_tail,
            lambda b, t, *_: (b,) + (0,) * len(shape_tail),
            memory_space=pltpu.VMEM,
        )

    w_args = [dec_w["w1"]]
    for w, b in dec_w["mid"]:
        w_args += [w, b]
    w_args += [dec_w["wo"], dec_w["bo"]]

    in_specs = [tiled((tile, F))]                        # X2
    args = [X2]
    if nmf:
        Wt, Hc = WH
        K = Wt.shape[1]
        in_specs += [
            per_b((K, F)),                               # Wt
            pl.BlockSpec((1, K, tile), lambda b, t, *_: (b, 0, t),
                         memory_space=pltpu.VMEM),       # H tile
        ]
        args += [Wt, Hc]
        if mode == "e":
            in_specs += [tiled((tile, 1))]               # mask (column)
            args += [mask[..., None]]
    else:
        in_specs += [tiled((tile, F))]                   # Vb
        args += [Vb]
    in_specs += [
        tiled((tile, 1)),                                # g (column)
        tiled((tile, H1)),                               # ypre
        tiled((tile, L)),                                # Z
        tiled((tile, F)),                                # Vs
    ]
    args += [g[..., None], ypre, Z, Vs]
    if noise is not None:
        Zn, U = noise
        in_specs += [
            pl.BlockSpec((1, n_steps, tile, L),
                         lambda b, t, *_: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_steps, tile),
                         lambda b, t, *_: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ]
        args += [Zn, U]
    in_specs += [full(w.shape) for w in w_args]
    args += w_args
    out_shapes = [
        jax.ShapeDtypeStruct((B, N, L), jnp.float32),    # Z out
        jax.ShapeDtypeStruct((B, N, F), jnp.float32),    # Vs out
    ]
    out_specs = [tiled((tile, L)), tiled((tile, F))]
    if mode == "wf":
        out_shapes += [
            jax.ShapeDtypeStruct((B, N, F), jnp.float32),
            jax.ShapeDtypeStruct((B, N, F), jnp.float32),
        ]
        out_specs += [tiled((tile, F)), tiled((tile, F))]
    else:
        out_shapes += [
            jax.ShapeDtypeStruct((B, nsamples, N, F), samples_dtype),
        ]
        out_specs += [
            pl.BlockSpec(
                (1, nsamples, tile, F),
                lambda b, t, *_: (b, 0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        if nmf:
            out_shapes += [
                jax.ShapeDtypeStruct((B, K, F), jnp.float32),   # numW
                jax.ShapeDtypeStruct((B, K, F), jnp.float32),   # denW
            ]
            out_specs += [per_b((K, F)), per_b((K, F))]
        else:
            out_shapes += [
                jax.ShapeDtypeStruct((B, N, F), jnp.float32),   # s1
                jax.ShapeDtypeStruct((B, N, F), jnp.float32),   # s2
            ]
            out_specs += [tiled((tile, F)), tiled((tile, F))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    if interpret is None:
        interpret = _default_interpret()

    def build_and_call():
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shapes
        )(seeds, *args)

    if interpret:
        # The TPU-semantics interpreter (plain interpret=True lacks the TPU
        # PRNG primitives on the CPU lowering path).
        with pltpu.force_tpu_interpret_mode():
            outs = build_and_call()
    else:
        outs = build_and_call()

    Z_out, Vs_out = outs[0], outs[1]
    if mode == "wf":
        return Z_out, Vs_out, (outs[2], outs[3])
    return Z_out, Vs_out, tuple(outs[2:])


# ---------------------------------------------------------------------------
# M-step sufficient-statistics kernel
# ---------------------------------------------------------------------------
#
# The NMF M-step needs reductions over the R sample axis at two NEW noise
# variances (after the W update, then after the H update + normalization —
# reference mcem.py:107-142), so they cannot be folded into the chain kernel
# the way the W-update sums are. As plain XLA these lower to kLoop reduce
# fusions whose inner loop strides the (B, R, N, F) sample buffer by a full
# (N, F) slab per step — measured ~30x below streaming bandwidth on v5e
# (4 x ~36 ms per EM iteration at B=32, N=512). This kernel makes each the
# single contiguous pass they should be: grid (B, N/T), the (R, T, F) sample
# tile VMEM-resident, reduction vectorized over R.


def _make_sums_kernel(mode, R, T, F, approx_recip, nmf=False):
    def recip(x):
        if approx_recip:
            return pl.reciprocal(x, approx=True)
        return 1.0 / x

    def kernel(samp_ref, src1_ref, *rest):
        if nmf:
            hb_ref, g_ref, x2_ref, o1_ref, o2_ref = rest
            Vb = lax.dot_general(                        # (T, F) on MXU
                hb_ref[0], src1_ref[0], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            g_ref, x2_ref, o1_ref, o2_ref = rest
            Vb = src1_ref[0]                             # (T, F)
        Vs = samp_ref[0].astype(jnp.float32)            # (R, T, F)
        G = g_ref[0]                                    # (T, 1)
        inv = recip(jnp.maximum(G * Vs + Vb, VX_FLOOR))  # (R, T, F)
        if mode == "h":
            s1 = jnp.sum(inv, axis=0)                   # s1 = sum_r Vx^-1
            s2 = jnp.sum(inv * inv, axis=0)             # s2 = sum_r Vx^-2
            if nmf:
                # H-update num/den directly (reference mcem.py:117-125):
                # (T, F) @ W (F, K) on the MXU -> (T, K); W arrives as
                # Wt (K, F), so contract dim 1 of both.
                Wt = src1_ref[0]
                o1_ref[0] = lax.dot_general(
                    x2_ref[0] * s2, Wt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o2_ref[0] = lax.dot_general(
                    s1, Wt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                o1_ref[0] = s1
                o2_ref[0] = s2
        else:
            X2 = x2_ref[0]                               # (T, F)
            num = jnp.sum(X2 * jnp.sum(Vs * inv * inv, axis=0), axis=1)
            den = jnp.sum(Vs * inv, axis=(0, 2))
            o1_ref[0] = num.reshape(T, 1)
            o2_ref[0] = den.reshape(T, 1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("mode", "tile", "approx_recip", "interpret"),
)
def nmf_sums_pallas(samples, Vb, g, X2=None, mode="h", tile=128,
                    approx_recip=False, interpret=None, WH=None):
    """One-pass M-step reductions over the MH sample buffer.

    samples: (B, R, N, F) (any float dtype, e.g. the chain's bf16 dumps);
    Vb: (B, N, F); g: (B, N); X2: (B, N, F), required for mode='g' (and
    for mode='h' with WH).

    WH: optional (Wt (B, K, F), H (B, K, N)) NMF factors replacing Vb —
    the kernel forms its Vb tiles on the MXU so the (B, N, F) noise
    variance never touches HBM.

    mode='h' -> (s1, s2), both (B, N, F) f32: sum_r Vx^-1 and sum_r Vx^-2
      (the H-update sums, reference mcem.py:117-125). With WH, instead of
      s1/s2 it returns the H-update (num, den) directly, both (B, N, K):
      num = (X2 * s2) W and den = s1 W, contracted on the MXU in-kernel.
    mode='g' -> (num, den), both (B, N) f32: sum_f X2 * sum_r Vs * Vx^-2 and
      sum_f sum_r Vs * Vx^-1 (the g-update sums, reference mcem.py:135-142).
    """
    B, R, N, F = samples.shape
    assert N % tile == 0, (N, tile)
    nmf = WH is not None
    assert (Vb is None) == nmf, "pass exactly one of Vb / WH"
    n_tiles = N // tile
    if X2 is None:
        X2 = Vb  # unused placeholder in plain 'h' mode (same shape/dtype)

    kernel = _make_sums_kernel(mode, R, tile, F, approx_recip, nmf=nmf)

    def tiled(shape_tail):
        return pl.BlockSpec(
            (1,) + shape_tail,
            lambda b, t: (b, t) + (0,) * (len(shape_tail) - 1),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec((1, R, tile, F), lambda b, t: (b, 0, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    if nmf:
        Wt, Hc = WH
        K = Wt.shape[1]
        in_specs += [
            pl.BlockSpec((1, K, F), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # Wt
            pl.BlockSpec((1, K, tile), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),      # H tile
        ]
        src = (Wt, Hc)
    else:
        in_specs += [tiled((tile, F))]                  # Vb
        src = (Vb,)
    in_specs += [
        tiled((tile, 1)),
        tiled((tile, F)),
    ]
    if mode == "h":
        if nmf:
            out_shapes = [jax.ShapeDtypeStruct((B, N, K), jnp.float32)] * 2
            out_specs = [tiled((tile, K))] * 2
        else:
            out_shapes = [jax.ShapeDtypeStruct((B, N, F), jnp.float32)] * 2
            out_specs = [tiled((tile, F))] * 2
    else:
        out_shapes = [jax.ShapeDtypeStruct((B, N, 1), jnp.float32)] * 2
        out_specs = [tiled((tile, 1))] * 2

    if interpret is None:
        interpret = _default_interpret()

    def call():
        return pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
        )(samples, *src, g[..., None], X2)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            o1, o2 = call()
    else:
        o1, o2 = call()
    if mode == "g":
        return o1[..., 0], o2[..., 0]
    return o1, o2


# ---------------------------------------------------------------------------
# Batched frames-major MCEM driver around the fused kernel
# ---------------------------------------------------------------------------


def _dec_parts(dec_params, L):
    """Decoder weight bundle for the kernel (z-rows of layer 1 split out;
    any hidden depth)."""
    l0 = dec_params["hidden"][0]
    return {
        "w1": l0["w"][:L],
        "mid": tuple(
            (layer["w"], layer["b"]) for layer in dec_params["hidden"][1:]
        ),
        "wo": dec_params["out"]["w"],
        "bo": dec_params["out"]["b"],
    }


def _nmf_m_step_batched(X2, mask, W, H, g, Vs, s1=None, s2=None,
                        update_nmf=True, Vb_fixed=None,
                        use_sums_kernel=True, approx_recip=False,
                        tile=128):
    """Batched NMF M-step in frames-major layout (X2/Vs (B,[R,]N,F),
    W (B,F,K), H (B,K,N), g (B,N)); same equations and ordering as
    engine.nmf_m_step (reference mcem.py:90-152). When the chain kernel
    already accumulated the W-update sums (s1 = Σ_r Vx^-1, s2 = Σ_r Vx^-2
    at chain-time Vb), the first pass over the samples is skipped. The
    remaining sample-buffer reductions (H-update and g-update sums) run
    through :func:`nmf_sums_pallas` unless `use_sums_kernel=False`."""
    m3 = mask[..., None]                      # (B,N,1)
    Vs_raw = Vs                               # kernel converts in-VMEM
    Vs = Vs.astype(jnp.float32)               # jnp-path convert (bf16 dumps)

    def vb():
        return jnp.einsum("bfk,bkn->bnf", W, H) if update_nmf else Vb_fixed

    def sums(Vb):
        if use_sums_kernel:
            a, b = nmf_sums_pallas(Vs_raw, Vb, g, mode="h", tile=tile,
                                   approx_recip=approx_recip)
            return b, a
        Vx = jnp.maximum(g[:, None, :, None] * Vs + Vb[:, None], VX_FLOOR)
        return jnp.sum(Vx**-2, axis=1), jnp.sum(Vx**-1, axis=1)

    Vb = vb()
    if update_nmf:
        if s1 is None:
            s2, s1 = sums(Vb)
        num = jnp.einsum("bnf,bkn->bfk", X2 * s2 * m3, H)
        den = jnp.einsum("bnf,bkn->bfk", s1 * m3, H)
        W = W * (num / den) ** 0.5

        Vb = vb()
        s2, s1 = sums(Vb)
        num = jnp.einsum("bnf,bfk->bkn", X2 * s2, W)
        den = jnp.einsum("bnf,bfk->bkn", s1, W)
        H = H * (num / den) ** 0.5

        norm_col = jnp.sum(jnp.abs(W), axis=1)          # (B,K)
        W = W / norm_col[:, None, :]
        H = H * norm_col[:, :, None]
        Vb = vb()

    if use_sums_kernel:
        num, den = nmf_sums_pallas(Vs_raw, Vb, g, X2=X2, mode="g",
                                   tile=tile, approx_recip=approx_recip)
    else:
        Vx = jnp.maximum(g[:, None, :, None] * Vs + Vb[:, None], VX_FLOOR)
        num = jnp.sum(X2 * jnp.sum(Vs * Vx**-2, axis=1), axis=-1)  # (B,N)
        den = jnp.sum(jnp.sum(Vs * Vx**-1, axis=1), axis=-1)
    g = g * (num / den) ** 0.5
    return W, H, g


def _masked_cost_batched(X2, mask, Vb, g, Vs):
    """(B,) masked expected neg-log-likelihood; Vs (B,R,N,F)."""
    Vx = jnp.maximum(
        g[:, None, :, None] * Vs.astype(jnp.float32) + Vb[:, None], VX_FLOOR
    )
    per = jnp.log(Vx) + X2[:, None] / Vx
    total = jnp.sum(per * mask[:, None, :, None], axis=(1, 2, 3))
    count = Vs.shape[1] * X2.shape[-1] * jnp.sum(mask, axis=1)
    return total / count


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "update_nmf", "tile", "compute_cost",
                     "samples_dtype", "matmul_dtype", "approx_recip",
                     "approx_trans"),
)
def mcem_batch_fused(vae_params, X_abs2, mask, y, keys,
                     cfg: MCEMConfig = MCEMConfig(), update_nmf=True,
                     Vb_fixed=None, tile=128, compute_cost=True,
                     samples_dtype=jnp.float32,
                     matmul_dtype=jnp.float32, approx_recip=False,
                     approx_trans=False, init=None):
    """Full batched MCEM with the fused Pallas chains.

    Same contract as engine.mcem_m1_batch / mcem_m2_batch: X_abs2 (B, F, N)
    with benign pad frames, mask (B, N), y (B, y_dim, N) or None,
    keys (B, 2) — only keys[0] seeds the chain (kernel PRNG streams are
    derived per (EM-iter, tile)). Returns the same result dict (reference
    (F, N) orientation). Requires the reference's 2-hidden-layer decoder
    and N % tile == 0.

    init: optional {"W","H","g","Z"} warm start in the result-dict
    orientation (W (B,F,K), H (B,K,N), g (B,N), Z (B,L,N)) — used by the
    PEEM->MCEM hybrid (peem.peem_mcem_m2_batch) and state-resume paths;
    replaces both the random NMF init and the encoder Z0.
    """
    params = {k: v for k, v in vae_params.items() if k != "y_dim"}
    enc = params["encoder"]
    dec = params["decoder"]
    assert 1 <= len(dec["hidden"]) <= 4, "fused path: 1-4 hidden layers"
    B, F, N = X_abs2.shape
    y_dim = 0 if y is None else y.shape[1]
    L = dec["hidden"][0]["w"].shape[0] - y_dim
    n_tiles = N // tile

    from ..models.nets import encoder_apply

    X2 = jnp.swapaxes(X_abs2, 1, 2)                      # (B, N, F)
    l0 = dec["hidden"][0]
    if y is None:
        enc_in = X2
        ypre = jnp.broadcast_to(
            l0["b"], (B, N, l0["b"].shape[0])
        )
    else:
        yT = jnp.swapaxes(y, 1, 2)                       # (B, N, y_dim)
        enc_in = jnp.concatenate([X2, yT], axis=-1)
        ypre = jnp.einsum("bny,yh->bnh", yT, l0["w"][L:]) + l0["b"]

    if init is None:
        _, mu, _ = encoder_apply(enc, enc_in.reshape(B * N, -1))
        Z = mu.reshape(B, N, L)
    else:
        Z = jnp.swapaxes(init["Z"], 1, 2)                # (B, N, L)
    dec_w = _dec_parts(dec, L)

    # initial Vs via the decoder (frames-major)
    h = jnp.tanh(jnp.einsum("bnl,lh->bnh", Z, dec_w["w1"]) + ypre)
    for w, b in dec_w["mid"]:
        h = jnp.tanh(jnp.einsum("bnh,hk->bnk", h, w) + b)
    Vs = jnp.exp(jnp.einsum("bnk,kf->bnf", h, dec_w["wo"]) + dec_w["bo"])

    key0 = keys[0]
    k_init, key0 = jax.random.split(key0)
    if init is not None:
        # Warm start (PEEM->MCEM hybrid, resumed runs): NMF factors and
        # gain in the reference (B, F, K)/(B, K, N)/(B, N) orientation.
        Wt = jnp.swapaxes(init["W"], 1, 2)
        H = init["H"]
        Vbf = None if update_nmf else jnp.swapaxes(Vb_fixed, 1, 2)
    elif update_nmf:
        k_w, k_h = jax.random.split(k_init)
        # sampled in the reference (B, F, K) orientation, carried
        # transposed as Wt (B, K, F) — the layout the kernels consume.
        # NOTE: drawn from the batch's leading key over the PADDED N
        # (unlike the XLA engine's per-utterance framewise_uniform), so
        # fused outputs depend on the batch plan / padded length —
        # statistically equivalent, not bit-stable across plans.
        W0 = jnp.maximum(jax.random.uniform(k_w, (B, F, cfg.nmf_rank)),
                         cfg.eps)
        Wt = jnp.swapaxes(W0, 1, 2)
        H = jnp.maximum(jax.random.uniform(k_h, (B, cfg.nmf_rank, N)),
                        cfg.eps)
        Vbf = None
    else:
        Wt = jnp.ones((B, 1, F), X2.dtype)
        H = jnp.zeros((B, 1, N), X2.dtype)
        Vbf = jnp.swapaxes(Vb_fixed, 1, 2)
    g = jnp.ones((B, N), X2.dtype) if init is None else init["g"]
    kern_kw = dict(tile=tile, samples_dtype=samples_dtype,
                   matmul_dtype=matmul_dtype, approx_recip=approx_recip,
                   approx_trans=approx_trans)

    use_b = cfg.noise_gain and not update_nmf
    if cfg.noise_gain and update_nmf:
        raise ValueError(
            "MCEMConfig.noise_gain requires a fixed noise model "
            "(update_nmf=False, i.e. noise_model 'spp'/'spp2')")

    if use_b:
        from .engine import noise_gain_state

        b0_gain, eff_vb, band_map = noise_gain_state(
            F, N, cfg.noise_gain_bands, Vbf, X2.dtype, batch=B)
    else:
        b0_gain = eff_vb = band_map = None

    def em_iter_b(carry, _):
        # fixed-noise model + per-frame (or per-band, noise_gain_bands>1)
        # noise gain (MCEMConfig.noise_gain, same math as
        # engine.nmf_m_step's b branches): the chain runs at the scaled
        # Vb; the b update reuses the 'h'-mode sums kernel (s1 = sum_r
        # Vx^-1, s2 = sum_r Vx^-2) with the UNSCALED Vbf as the
        # gradient-split coefficient ((band-restricted) f-sums), then g
        # updates at the new b.
        Wt, H, g, b, Z, Vs, key = carry
        key, sub = jax.random.split(key)
        seeds = jax.random.randint(sub, (B, n_tiles), 0, 2**31 - 1,
                                   dtype=jnp.int32)
        Vb_eff = eff_vb(b)
        Z, Vs, (samples, *_rest) = mh_chain_pallas(
            dec_w, X2, Vb_eff, g, ypre, Z, Vs, seeds, mode="e",
            nsamples=cfg.nsamples_E_step, burnin=cfg.burnin_E_step,
            var_RW=cfg.var_RW, **kern_kw,
        )
        s1, s2 = nmf_sums_pallas(samples, Vb_eff, g, mode="h", tile=tile,
                                 approx_recip=approx_recip)
        if band_map is None:
            num_b = jnp.sum(X2 * Vbf * s2, axis=-1)      # (B, N)
            den_b = jnp.sum(Vbf * s1, axis=-1)
        else:
            num_b = jnp.einsum("bnf,kf->bkn", X2 * Vbf * s2, band_map)
            den_b = jnp.einsum("bnf,kf->bkn", Vbf * s1, band_map)
        b2 = b * (num_b / den_b) ** 0.5
        num_g, den_g = nmf_sums_pallas(
            samples, eff_vb(b2), g, X2=X2, mode="g",
            tile=tile, approx_recip=approx_recip,
        )
        g2 = g * (num_g / den_g) ** 0.5
        if compute_cost:
            cost = _masked_cost_batched(X2, mask, eff_vb(b2), g2, samples)
        else:
            cost = jnp.zeros((B,), X2.dtype)
        return (Wt, H, g2, b2, Z, Vs, key), cost

    def em_iter(carry, _):
        Wt, H, g, Z, Vs, key = carry
        key, sub = jax.random.split(key)
        seeds = jax.random.randint(sub, (B, n_tiles), 0, 2**31 - 1,
                                   dtype=jnp.int32)
        if update_nmf:
            # Whole M-step on kernel-produced statistics: the chain kernel
            # emits the W-update num/den (contracted with H in-kernel at
            # chain-time Vb, reference mcem.py:107-115); the sums kernel
            # emits the H-update num/den at post-W Vb (mcem.py:117-133)
            # and the g-update sums at post-normalize Vb (mcem.py:135-142).
            # No (B, N, F) noise-variance or s1/s2 array ever exists in
            # HBM.
            Z, Vs, (samples, numW, denW) = mh_chain_pallas(
                dec_w, X2, None, g, ypre, Z, Vs, seeds, mode="e",
                nsamples=cfg.nsamples_E_step, burnin=cfg.burnin_E_step,
                var_RW=cfg.var_RW, WH=(Wt, H), mask=mask, **kern_kw,
            )
            Wt2 = Wt * (numW / denW) ** 0.5
            numH, denH = nmf_sums_pallas(
                samples, None, g, X2=X2, mode="h", WH=(Wt2, H),
                tile=tile, approx_recip=approx_recip,
            )
            H2 = H * jnp.swapaxes((numH / denH) ** 0.5, 1, 2)
            norm_col = jnp.sum(jnp.abs(Wt2), axis=2)       # (B, K)
            Wt2 = Wt2 / norm_col[..., None]
            H2 = H2 * norm_col[:, :, None]
            num_g, den_g = nmf_sums_pallas(
                samples, None, g, X2=X2, mode="g", WH=(Wt2, H2),
                tile=tile, approx_recip=approx_recip,
            )
            g2 = g * (num_g / den_g) ** 0.5
        else:
            Z, Vs, (samples, *_rest) = mh_chain_pallas(
                dec_w, X2, Vbf, g, ypre, Z, Vs, seeds, mode="e",
                nsamples=cfg.nsamples_E_step, burnin=cfg.burnin_E_step,
                var_RW=cfg.var_RW, **kern_kw,
            )
            Wt2, H2 = Wt, H
            _, _, g2 = _nmf_m_step_batched(
                X2, mask, None, None, g, samples,
                update_nmf=False, Vb_fixed=Vbf, tile=tile,
                approx_recip=approx_recip,
            )
        if compute_cost:
            Vb2 = (jnp.einsum("bkf,bkn->bnf", Wt2, H2) if update_nmf
                   else Vbf)
            cost = _masked_cost_batched(X2, mask, Vb2, g2, samples)
        else:
            cost = jnp.zeros((B,), X2.dtype)
        return (Wt2, H2, g2, Z, Vs, key), cost

    if use_b:
        b = b0_gain
        (Wt, H, g, b, Z, Vs, key0), cost = lax.scan(
            em_iter_b, (Wt, H, g, b, Z, Vs, key0), None, length=cfg.niter
        )
        Vbf = eff_vb(b)                     # WF chain at the learned gain
    else:
        b = None
        (Wt, H, g, Z, Vs, key0), cost = lax.scan(
            em_iter, (Wt, H, g, Z, Vs, key0), None, length=cfg.niter
        )

    key0, sub = jax.random.split(key0)
    seeds = jax.random.randint(sub, (B, n_tiles), 0, 2**31 - 1,
                               dtype=jnp.int32)
    Z, Vs, (ws, wn) = mh_chain_pallas(
        dec_w, X2, None if update_nmf else Vbf, g, ypre, Z, Vs, seeds,
        mode="wf", nsamples=cfg.nsamples_WF, burnin=cfg.burnin_WF,
        var_RW=cfg.var_RW, WH=(Wt, H) if update_nmf else None,
        tile=tile, matmul_dtype=matmul_dtype, approx_recip=approx_recip,
        approx_trans=approx_trans,
    )
    WFs = jnp.swapaxes(ws / cfg.nsamples_WF, 1, 2)       # back to (F,N)
    WFn = jnp.swapaxes(wn / cfg.nsamples_WF, 1, 2)
    out = {
        "WFs": WFs, "WFn": WFn, "cost": jnp.swapaxes(cost, 0, 1),
        "W": jnp.swapaxes(Wt, 1, 2), "H": H, "g": g,
        "Z": jnp.swapaxes(Z, 1, 2),
    }
    if use_b:
        out["b"] = b
    return out
