"""On-chip validation of the Pallas TPU kernels against their XLA references.

The interpreter-mode tests (tests/test_kernels_interpret.py) validate kernel
*math*; this script validates the *Mosaic lowering* on real hardware — the
documented TPU gaps (alignment constraints, bf16 MXU accumulation, shifted
view tiling) only bite on-chip.  Prints one JSON verdict line per kernel and
an overall line; exit code 0 iff every kernel passes.

Run on the tunneled TPU:  python scripts/tpu_kernel_check.py
Results belong in PARITY.md ("on-chip kernel check").
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    results = []

    def record(kernel, max_abs, max_rel, tol, extra=None):
        ok = bool(max_abs <= tol)
        row = {
            "kernel": kernel,
            "backend": backend,
            "max_abs_err": float(max_abs),
            "max_rel_err": float(max_rel),
            "tol": tol,
            "ok": ok,
        }
        if extra:
            row.update(extra)
        results.append(row)
        print(json.dumps(row))

    rng = np.random.default_rng(0)

    # ---- STFT front end vs jnp DFT-matmul reference ----------------------
    from alivevc_tpu.kernels.stft_pallas import stft_magnitude_pallas
    from alivevc_tpu.ops.stft import spectrogram

    wave = (0.5 * np.sin(2 * np.pi * 220 * np.arange(48_000) / 16000)
            + 0.1 * rng.standard_normal(48_000)).astype(np.float32)[None, :]
    got = np.asarray(stft_magnitude_pallas(jnp.asarray(wave))[:, :-1, :])
    ref = np.asarray(spectrogram(jnp.asarray(wave)))
    err = np.abs(got - ref)
    record("stft_magnitude", err.max(), (err / (np.abs(ref) + 1e-3)).max(), 2e-2)

    # ---- fused kNN top-k vs lax.top_k ------------------------------------
    from alivevc_tpu.kernels.knn_pallas import match_features_pallas
    from alivevc_tpu.ops.knn import match_features

    src = jnp.asarray(rng.standard_normal((450, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((8192, 768)).astype(np.float32))
    got = np.asarray(match_features_pallas(src, lib, k=4))
    # the XLA reference must also run fp32-highest: at TPU default precision
    # its cosine matmul is bf16-ish and flips near-ties on random data
    with jax.default_matmul_precision("highest"):
        ref = np.asarray(match_features(src, lib, k=4))
    err = np.abs(got - ref)
    record("knn_match", err.max(), (err / (np.abs(ref) + 1e-3)).max(), 5e-3)

    # ---- bf16 fast path (subtiled packed-index extraction) ---------------
    # approximate mode: assert *quality* — every returned neighbour's true
    # fp32 cosine is within a small margin of the exact k-th best
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas as _topk

    got_fv, got_fi = _topk(src, lib, 4, precision="default")
    srcn = np.asarray(src) / np.linalg.norm(np.asarray(src), axis=1, keepdims=True)
    libn = np.asarray(lib) / np.linalg.norm(np.asarray(lib), axis=1, keepdims=True)
    sims_true = srcn @ libn.T
    true_of_got = np.take_along_axis(sims_true, np.asarray(got_fi), axis=1)
    kth = np.sort(sims_true, axis=1)[:, -4:][:, :1]
    margin = float((kth - true_of_got).max())       # worst shortfall vs kth best
    verr = np.abs(np.asarray(got_fv) - true_of_got)
    record("knn_fast_bf16", max(margin, 0.0), verr.max(), 5e-3,
           {"note": "quality margin vs exact kth-best (approx mode)"})

    # ---- penalty-column exclusion (sharded retrieval path) ---------------
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas
    from alivevc_tpu.ops.knn import topk_cosine_chunked

    n_valid = 7000
    valid = jnp.arange(lib.shape[0]) < n_valid
    pen = jnp.where(valid, 0.0, -4.0)
    got_v, got_i = knn_topk_pallas(src, lib, 4, penalty=pen)
    # same highest-precision rule as knn_match above: the chunked XLA
    # reference's cosine matmul is bf16 at TPU default precision and flips
    # near-ties on random data, which reads as spurious index/value error
    with jax.default_matmul_precision("highest"):
        want_v, want_i = topk_cosine_chunked(src, lib, 4, chunk=2048, valid=valid)
    idx_mismatch = float(np.mean(np.asarray(got_i) != np.asarray(want_i)))
    err = np.abs(np.asarray(got_v) - np.asarray(want_v))
    record("knn_penalty_column", max(err.max(), idx_mismatch),
           (err / (np.abs(np.asarray(want_v)) + 1e-3)).max(), 5e-3)

    # ---- harmonic oscillator source vs XLA cumsum reference --------------
    from alivevc_tpu.kernels.oscillator_pallas import harmonic_source_pallas
    from alivevc_tpu.models.decoder import harmonic_oscillator, init_decoder

    lf = 120
    f0 = jnp.asarray(
        (150.0 + 40.0 * np.sin(np.linspace(0, 6, lf)))
        .astype(np.float32)[None, :, None]
    )
    mul = jnp.arange(1, 65, dtype=jnp.float32)
    formants = f0 * mul
    amps = jnp.asarray(np.exp(rng.standard_normal((1, lf, 64)) * 0.3).astype(np.float32))
    got = np.asarray(harmonic_source_pallas(formants, amps))[0, :, 0]

    # XLA reference path: mean(sin(2π·cumsum(interp(formants)/sr))·interp(amps))
    from alivevc_tpu.ops.interp import linear_interpolate
    import math

    fi = linear_interpolate(formants, lf * 320, axis=1)
    ai = linear_interpolate(amps, lf * 320, axis=1)
    dt = jnp.cumsum(fi / 16000.0, axis=1)
    dt = dt - dt[:, 0][:, None, :]
    ref = np.asarray(jnp.mean(jnp.sin(2 * math.pi * dt) * ai, axis=2))[0]
    err = np.abs(got - ref)
    # phase accumulates over 38400 samples; tolerance reflects fp32 cumsum drift
    record("harmonic_oscillator", err.max(), err.max() / (np.abs(ref).max() + 1e-6), 5e-3)

    # ---- Chebyshev-recurrence oscillator vs the same XLA reference -------
    from alivevc_tpu.kernels.oscillator_pallas import harmonic_source_cheb_pallas

    got_c = np.asarray(harmonic_source_cheb_pallas(f0, amps))[0, :, 0]
    err = np.abs(got_c - ref)
    record("harmonic_oscillator_cheb", err.max(),
           err.max() / (np.abs(ref).max() + 1e-6), 5e-3)

    # ---- packed filter U-Net vs plain (on-chip layouts) ------------------
    from alivevc_tpu.config import DecoderConfig
    from alivevc_tpu.models.decoder import filter_unet
    from alivevc_tpu.models.filter_packed import filter_unet_packed

    cfg = DecoderConfig()
    dec = init_decoder(jax.random.PRNGKey(0))
    lw = 1920 * 8
    source = jnp.asarray(rng.standard_normal((2, lw, 1)).astype(np.float32) * 0.3)
    cond = jnp.asarray(
        rng.standard_normal((2, lw // 320, cfg.channels)).astype(np.float32) * 0.5
    )
    os.environ["ALIVEVC_FORCE_PLAIN"] = "1"
    ref = np.asarray(jax.jit(lambda *a: filter_unet(dec["filter"], *a, cfg))(source, cond))
    del os.environ["ALIVEVC_FORCE_PLAIN"]
    got = np.asarray(
        jax.jit(lambda *a: filter_unet_packed(dec["filter"], *a, cfg))(source, cond)
    )
    err = np.abs(got - ref)
    record("filter_packed", err.max(), err.max() / (np.abs(ref).max() + 1e-6), 5e-3)

    # ---- fused filter-level Pallas kernel vs packed XLA -------------------
    from alivevc_tpu.kernels.filter_pallas import fused_filter_block
    from alivevc_tpu.models.filter_packed import _filter_block_packed, _pfac

    chans = list(cfg.filter_channels)
    lens = [lw]
    for r in cfg.filter_rates:
        lens.append(lens[-1] // r)
    f = lw // 320
    # levels 0-1 run the MXU selector-dot FiLM (film_impl auto -> 'mxu' at
    # P>=8 since r4), 2-3 the VPU expansion — this covers both lowerings
    for lvl in (0, 1, 2, 3):
        c = chans[lvl]
        p = _pfac(c)
        b = lens[lvl] // p
        r_film = lens[lvl] // f
        blk = dec["filter"]["blocks"][len(chans) - 1 - lvl]
        xl = jnp.asarray(rng.standard_normal((2, b, p * c)).astype(np.float32) * 0.3)
        got = np.asarray(
            jax.jit(lambda *a: fused_filter_block(*a, p, c, r_film,
                                                  precision="highest"))(blk, xl, cond)
        )
        ref = np.asarray(
            jax.jit(lambda *a: _filter_block_packed(*a, p, c, r_film, b))(blk, xl, cond)
        )
        err = np.abs(got - ref)
        record(f"fused_filter_lvl{lvl}", err.max(),
               err.max() / (np.abs(ref).max() + 1e-6), 5e-3)

    # ---- r5: exact two-pass kNN ('highest' bit-parity vs chunked oracle) -
    from alivevc_tpu.kernels.knn_twopass import knn_topk_twopass

    with jax.default_matmul_precision("highest"):
        want_v, want_i = topk_cosine_chunked(src, lib, 4, chunk=2048)
    got_v, got_i = knn_topk_twopass(src, lib, 4, precision="highest")
    idx_mismatch = float(np.mean(np.asarray(got_i) != np.asarray(want_i)))
    err = np.abs(np.asarray(got_v) - np.asarray(want_v))
    record("knn_twopass_exact_highest", max(err.max(), idx_mismatch),
           (err / (np.abs(np.asarray(want_v)) + 1e-3)).max(), 5e-3)

    # ---- r5: dynamic valid-row suffix exclusion (sharded fast path) ------
    vr = int(lib.shape[0] - 1234)
    _, gi1 = knn_topk_twopass(src, lib, 4, valid_rows=jnp.int32(vr))
    _, gi2 = knn_topk_twopass(src[:, :], lib[:vr], 4)
    oob = float(np.asarray(gi1).max() >= vr)
    agree = float(np.mean(np.sort(np.asarray(gi1), 1) == np.sort(np.asarray(gi2), 1)))
    record("knn_twopass_valid_rows", max(oob, 1.0 - agree), 1.0 - agree, 2e-2,
           {"note": "suffix exclusion + agreement vs truncated library"})

    # ---- r5: fused-up filter levels (up conv + skip in-kernel) -----------
    from alivevc_tpu.kernels.filter_pallas import fused_filter_block_up
    from alivevc_tpu.models.filter_packed import _packed_linear

    ps = [_pfac(ch) for ch in chans]
    for i in range(len(chans)):
        lvl = len(chans) - 1 - i
        pin = ps[lvl + 1] if lvl + 1 < len(chans) else 1
        cin = chans[lvl + 1] if lvl + 1 < len(chans) else chans[-1]
        pout, cout = ps[lvl], chans[lvl]
        b_in = lens[lvl + 1] // pin
        b_out = lens[lvl] // pout
        r_film = lens[lvl] // f
        r_up = list(cfg.filter_rates)[lvl]
        blk = dec["filter"]["blocks"][i]
        upp = dec["filter"]["ups"][i]
        w3 = upp["w"].reshape(cin, r_up, cout).transpose(1, 0, 2)
        xp = jnp.asarray(rng.standard_normal((2, b_in, pin * cin)).astype(np.float32) * 0.3)
        sk = jnp.asarray(rng.standard_normal((2, b_in, pin * cin)).astype(np.float32) * 0.3)
        xup = _packed_linear(xp + sk, w3, upp["b"], "up", r_up, 0, pin, pout, b_out)
        ref = np.asarray(
            jax.jit(lambda *a: _filter_block_packed(*a, pout, cout, r_film,
                                                    b_out))(blk, xup, cond)
        )
        got = np.asarray(
            jax.jit(lambda *a: fused_filter_block_up(
                *a, pin, pout, cout, r_film, r_up, precision="highest"
            ))(blk, w3, upp["b"], xp, sk, cond)
        )
        err = np.abs(got - ref)
        record(f"fused_up_lvl{lvl}", err.max(),
               err.max() / (np.abs(ref).max() + 1e-6), 5e-3)

    ok = all(r["ok"] for r in results)
    print(json.dumps({"overall_ok": ok, "kernels": len(results), "backend": backend}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
