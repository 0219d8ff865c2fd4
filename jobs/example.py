"""Production example job (the reference's jobs/example.jl equivalent):
run any scheme by name at a chosen resolution."""
import argparse

SCHEMES = {
    "wcsph": "wcsph_perturbed_witch",
    "hopkins": "hopkins_perturbed_witch",
    "full_hopkins": "full_hopkins_perturbed_witch",
    "hopkins_total": "hopkins_total_witch",
    "pavelka": "pavelka_total_witch",
}

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("scheme", choices=SCHEMES, nargs="?", default="wcsph")
    ap.add_argument("--rows", type=int, default=75)
    ap.add_argument("--t-end", type=float, default=20.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import importlib
    mod = importlib.import_module(
        f"sph_mountain_waves_tpu.models.{SCHEMES[args.scheme]}")
    from sph_mountain_waves_tpu.models.witch_common import WitchConfig
    cfg = WitchConfig(n_rows=args.rows, t_end=args.t_end, dtype="float32",
                      self_density=True, layout="bucket", skin=0.2)
    if args.scheme == "pavelka":
        from sph_mountain_waves_tpu.models.pavelka_total_witch import PavelkaConfig
        cfg = PavelkaConfig(n_rows=args.rows, t_end=args.t_end, dtype="float32")
    out = mod.run(cfg, out_path=args.out, verbose=True)
    print("done; final u_max =", out["u_max"][-1])
