"""Arm-G (lj300 hi-res, n_rows=300) analysis from the VERBOSE frame log.

The round-5 resolution step on wave-generation efficiency (BENCHMARKS.md
closing statement's open follow-up: does the stationary-source amplitude
ratio rise toward 1 as dr/h_m shrinks?) runs ~75 min at full t_end=1500 s,
longer than a round budget allows, so the job is wall-bounded and this
script extracts the diagnostics from the per-frame verbose lines instead
of relying on linear_drag.run returning (every observable is printed per
frame by _run_witch_scheme).

Usage: python scripts/r5_armG_analysis.py [/tmp/armG.log] [window_frac]
"""
import re
import sys

import numpy as np

D_LIN = 3.855e4          # printed by the job header (h_m=300, n_rows=300)
H_M = 300.0
DR = 20e3 / 300.0
Z0_GEN = H_M + 2.5 * DR + 250.0   # linear_drag.py:143
LEVELS = [1000, 1500, 2000, 2500, 3000, 4000, 5000]


def analytic(xc, z, U=20.0, N=0.01957, h_m=H_M, a=5e3):
    # same closed form as scripts/r5_gen_analysis.py
    m = N / U
    denom = a**2 + xc**2
    ph = m * z
    zeta_x = h_m * a * (-np.sin(ph) * denom
                        - 2 * xc * (a * np.cos(ph) - xc * np.sin(ph))) \
        / denom**2
    zeta_z = h_m * a * m * (-a * np.sin(ph) - xc * np.cos(ph)) / denom
    return -U * zeta_z, U * zeta_x          # u', w


def parse(path):
    frames = []
    for line in open(path):
        if not line.startswith("t = "):
            continue
        d = {}
        for k, v in re.findall(r"(\w+) = ([-+0-9.e]+)", line):
            d[k] = float(v)
        frames.append(d)
    return frames


def main(path="/tmp/armG.log", window=0.4):
    frames = parse(path)
    t_last = frames[-1]["t"]
    k0 = int(len(frames) * (1.0 - window))
    late = frames[k0:]
    print(f"{len(frames)} frames to t={t_last:.0f} s; "
          f"averaging frames {k0}.. (t>={frames[k0]['t']:.0f} s)")

    def mean(key):
        return float(np.mean([f[key] for f in late if key in f]))

    def sem(key):
        v = [f[key] for f in late if key in f]
        return float(np.std(v) / np.sqrt(len(v)))

    print("PROFILE G_lj300_hires(truncated) " + " ".join(
        f"z{z}={mean(f'fp{z}')/D_LIN:.3f}+-{sem(f'fp{z}')/D_LIN:.3f}"
        for z in LEVELS))
    print("AMP " + " ".join(
        f"z{z}=u{mean(f'ampu{z}'):.2f}/w{mean(f'ampw{z}'):.2f}"
        for z in LEVELS))
    nb = max(int(k[2:]) for k in frames[-1] if re.fullmatch(r"su\d+", k)) + 1
    xc = -15e3 + (np.arange(nb) + 0.5) * 1000.0
    ua, wa = analytic(xc, Z0_GEN)
    for tag, pre, want in (("w", "sw", wa), ("u'", "su", ua)):
        got = np.array([mean(f"{pre}{i}") for i in range(nb)])
        alpha = float(np.sum(got * want) / np.sum(want * want))
        resid = float(np.sqrt(np.mean((got - alpha * want) ** 2)))
        print(f"GEN {tag}: alpha={alpha:.3f} (arm E at dr=100 m: "
              f"w 0.64 / u' 0.27)  rms(analytic)={np.sqrt(np.mean(want**2)):.3f}"
              f"  rms(resid)={resid:.3f}  rms(meas)={np.sqrt(np.mean(got**2)):.3f}")
    print("drag/D_lin (surface reaction):", mean("drag") / D_LIN,
          "+-", sem("drag") / D_LIN)


if __name__ == "__main__":
    main(*(([sys.argv[1]] if len(sys.argv) > 1 else [])
           + ([float(sys.argv[2])] if len(sys.argv) > 2 else [])))
