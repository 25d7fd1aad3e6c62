"""Analytic FLOPs per pipeline stage + MFU against measured stage times.

Prints the roofline table PERF.md embeds: for each stage of the offline
conversion step (BASELINE config #3 shape: batch 64 x 9 s windows, 100k
library), its analytic FLOPs, the measured ms (pass --times, a JSON dict, or
edit MEASURED below after a profile_stages run), and the implied MXU
utilization at the v5e peak.  VPU-bound stages (oscillator, kNN extraction)
also get an element-op estimate against the VPU peak.

Peaks (TPU v5e, per chip): 197 TFLOP/s bf16 MXU, 99 TFLOP/s fp32-equivalent
via bf16x3, ~3.9 T f32 element-ops/s VPU (8x128x4 ALUs @ 940 MHz), 819 GB/s
HBM.
"""

from __future__ import annotations

import argparse
import json

GFLOP = 1e9

# BASELINE config #3 shape
BATCH = 64
WINDOW = 144_000          # 3 x 48000 samples
T = WINDOW // 320         # 450 frames per window
LIB = 100_000

MXU_BF16 = 197e12
VPU_F32 = 3.9e12
HBM = 819e9

# measured ms from scripts/profile_stages.py --batch 64 --impl pallas
# --dtype bf16 (deltas); refresh after kernel changes
MEASURED_DEFAULT = {   # round-3 final (2026-08-19)
    "stft+f0": 6.2,
    "content_encoder": 4.1,
    "knn": 55.7,
    "feature_extractor": 6.0,
    "oscillator": 6.2,
    "filter": 111.3,
}


def convnext_flops(t, cin, cint, hidden, layers, cout, adaptive=False):
    f = t * cin * cint * 2                       # input 1x1
    per = t * (cint * 7 * 2                      # depthwise k=7
               + cint * hidden * 2 * 2           # two pointwise
               + (cint * hidden * 2 * 2 if adaptive else 0))  # film projections
    f += layers * per
    f += t * cint * cout * 2
    return f


def stage_flops():
    n, t = BATCH, T
    s = {}
    # STFT as DFT matmul: [N*T, 1280] @ [1280, 2*641]
    s["stft+f0"] = (
        n * t * 1280 * 641 * 2 * 2
        + convnext_flops(n * t, 641, 256, 512, 4, 4096)
    )
    s["content_encoder"] = convnext_flops(n * t, 641, 512, 1536, 4, 768)
    s["knn"] = n * t * LIB * 768 * 2             # single-pass bf16 matmul
    s["knn_vpu_ops"] = n * t * LIB * 12          # packed extraction, 3 passes x 4 iters
    s["feature_extractor"] = convnext_flops(n * t, 768, 512, 1536, 4, 512,
                                            adaptive=True)
    s["oscillator_vpu_ops"] = n * WINDOW * (64 * 3 + 30)   # cheb recurrence
    # filter: levels (res-block stacks as shift matmuls) + glue
    lw = WINDOW
    lens = [lw, lw // 2, lw // 4, lw // 32, lw // 320]
    chans = [8, 16, 64, 256]
    packs = [16, 8, 2, 1]
    mats = {16: 13, 8: 15, 2: 35, 1: 31}         # per-level shift-matmul count
    filt = 0
    for lvl in range(4):
        rows = n * lens[lvl] // packs[lvl]
        w = max(128, packs[lvl] * chans[lvl])
        filt += rows * mats[packs[lvl]] * w * w * 2
    # glue: in/out convs + down/up selectors (small)
    filt += n * lw * (7 * 8 * 2 * 2 + 8 * 8 * 2)
    for lvl, r in enumerate([2, 2, 8, 10]):
        cin, cout = chans[lvl], (chans + [256])[lvl + 1]
        filt += 2 * n * lens[lvl + 1] * r * cin * cout * 2   # down + up
    s["filter"] = filt
    return s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--times", default=None,
                    help="stage->ms JSON overriding the defaults: either an "
                         "inline dict or a path written by profile_stages.py "
                         "--json (one-command refresh, VERDICT r3 item 8)")
    args = ap.parse_args()
    meas = dict(MEASURED_DEFAULT)
    if args.times:
        import os

        if os.path.exists(args.times):
            with open(args.times) as f:
                meas.update(json.load(f))
        else:
            meas.update(json.loads(args.times))

    fl = stage_flops()
    print(f"{'stage':18s} {'GFLOP':>9s} {'ms':>8s} {'TFLOP/s':>8s} {'MXU%':>6s}  notes")
    tot_ms = 0.0
    for stage in ("stft+f0", "content_encoder", "knn", "feature_extractor",
                  "oscillator", "filter"):
        ms = meas.get(stage)
        g = fl.get(stage, 0) / GFLOP
        tot_ms += ms or 0.0
        if stage == "oscillator":
            ops = fl["oscillator_vpu_ops"] / GFLOP
            vp = ops / ms / (VPU_F32 / 1e12) * 100 if ms else 0
            print(f"{stage:18s} {'—':>9s} {ms:8.1f} {'—':>8s} {'—':>6s}  "
                  f"VPU-bound: {ops:.0f} G-ops, {vp:.0f}% VPU peak")
            continue
        tf = g / ms if ms else 0.0  # GFLOP/ms == TFLOP/s
        mxu = tf / (MXU_BF16 / 1e12) * 100
        extra = ""
        if stage == "knn":
            vops = fl["knn_vpu_ops"] / GFLOP
            extra = (f"+ {vops:.0f} G VPU extraction ops "
                     f"({vops / ms / (VPU_F32/1e12) * 100:.0f}% VPU if alone)")
        print(f"{stage:18s} {g:9.0f} {ms:8.1f} {tf:8.1f} {mxu:6.1f}  {extra}")
    audio = BATCH * 48_000 / 16_000
    print(f"\nstage-sum {tot_ms:.1f} ms -> {audio / (tot_ms/1e3):.0f} audio-s/s "
          f"(kept audio {audio:.0f} s/step)")


if __name__ == "__main__":
    main()
