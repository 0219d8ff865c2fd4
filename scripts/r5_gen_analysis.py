"""Compare arm E's stationary-wave x-bins (GENW/GENU lines in
/tmp/r5_profile.log) against the analytic linear solution at the band
height — the generation-deficit arbiter (BENCHMARKS.md round-5 section).

Usage: python scripts/r5_gen_analysis.py [E_lj300_tall]
"""
import re
import sys

import numpy as np


def analytic(xc, z, U=20.0, N=0.01957, h_m=300.0, a=5e3):
    m = N / U
    denom = a**2 + xc**2
    ph = m * z
    zeta_x = h_m * a * (-np.sin(ph) * denom
                        - 2 * xc * (a * np.cos(ph) - xc * np.sin(ph))) \
        / denom**2
    zeta_z = h_m * a * m * (-a * np.sin(ph) - xc * np.cos(ph)) / denom
    return -U * zeta_z, U * zeta_x          # u', w


def main(arm="E_lj300_tall", z0=800.0, h_m=300.0):
    lines = open("/tmp/r5_profile.log").read().splitlines()
    gw = next(l for l in lines if l.startswith(f"GENW {arm}"))
    gu = next(l for l in lines if l.startswith(f"GENU {arm}"))
    mw = np.array([float(v) for v in gw.split()[2:]])
    mu = np.array([float(v) for v in gu.split()[2:]])
    nb = len(mw)
    xc = -15e3 + (np.arange(nb) + 0.5) * 1000.0
    ua, wa = analytic(xc, z0, h_m=h_m)
    for tag, got, want in (("w", mw, wa), ("u'", mu, ua)):
        num = float(np.sum(got * want))
        den = float(np.sum(want * want))
        alpha = num / den                     # best-fit amplitude ratio
        resid = float(np.sqrt(np.mean((got - alpha * want) ** 2)))
        print(f"{tag}: fit amplitude ratio alpha={alpha:.3f} "
              f"(1.0 = linear theory)  rms(analytic)={np.sqrt(den/nb):.3f}"
              f"  rms(resid)={resid:.3f}  rms(meas)={np.sqrt(np.mean(got**2)):.3f}")
    print("x(km)  w_meas  w_analytic  u_meas  u_analytic")
    for i in range(0, nb, 2):
        print(f"{xc[i]/1e3:6.1f} {mw[i]:7.3f} {wa[i]:10.3f} "
              f"{mu[i]:7.3f} {ua[i]:10.3f}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
