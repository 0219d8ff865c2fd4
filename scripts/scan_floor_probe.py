"""Root-cause probes for the ~0.33 ms/iter lax.scan floor (VERDICT r3 #2).

Known (round 3): an IDENTITY-body scan costs ~300 us/iter at 1M slots
regardless of buffer count (22 vs 1), total bytes, or unroll. These probes
discriminate between the remaining hypotheses:

  H1 axon per-iteration runtime overhead (tunnel/plugin executes scan
     iterations with host involvement)    -> scalar-carry identity scan
     shows the same ~300 us/iter, CPU backend shows ~us/iter.
  H2 XLA:TPU structural per-iteration cost scaling with buffer SIZE
     (copy/alias bookkeeping)             -> scalar carry is ~free, 1M
     carry pays; nesting scans changes nothing.
  H3 measurement artifact (dispatch+sync amortization mismatch)
     -> per-iter cost falls with L (fixed cost / L), not flat.

Usage:  python scripts/scan_floor_probe.py          (axon TPU)
        python scripts/scan_floor_probe.py cpu      (CPU contrast)
Appends results to /tmp/scan_floor.log.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax
import jax.numpy as jnp

PLAT = jax.devices()[0].platform
N = 1 << 20


def timed(fn, arg, reps=3):
    out = fn(arg)              # compile
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(arg)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.time() - t0)
    return best


def report(name, L, t):
    line = f"PROBE {PLAT} {name:24s} L={L:5d} total={t*1e3:8.2f} ms  per_iter={t/L*1e6:8.1f} us"
    print(line, flush=True)
    with open("/tmp/scan_floor.log", "a") as f:
        f.write(line + "\n")


def scan_identity(L):
    def fn(x):
        return jax.lax.scan(lambda c, _: (c, None), x, None, length=L)[0]
    return jax.jit(fn)


def scan_add(L):
    def fn(x):
        return jax.lax.scan(lambda c, _: (c + 1.0, None), x, None, length=L)[0]
    return jax.jit(fn)


def nested_scan(Lo, Li):
    def fn(x):
        def outer(c, _):
            c2 = jax.lax.scan(lambda c3, _: (c3, None), c, None,
                              length=Li)[0]
            return c2, None
        return jax.lax.scan(outer, x, None, length=Lo)[0]
    return jax.jit(fn)


def while_identity(L):
    def fn(x):
        def body(carry):
            k, c = carry
            return (k + 1, c)
        return jax.lax.while_loop(lambda kc: kc[0] < L, body, (0, x))[1]
    return jax.jit(fn)


if __name__ == "__main__":
    scalar = jnp.ones(())
    big = jnp.ones((N,), jnp.float32)

    for L in (16, 128, 1024):
        report("scan_identity_scalar", L, timed(scan_identity(L), scalar))
    for L in (16, 128):
        report("scan_identity_1M", L, timed(scan_identity(L), big))
        report("scan_add_1M", L, timed(scan_add(L), big))
        report("while_identity_1M", L, timed(while_identity(L), big))
    report("nested_16x16_1M", 256, timed(nested_scan(16, 16), big))
    # one real-ish body: 1M elementwise chain x <- x*1.0000001 + 1e-9, the
    # shape/op class of the cheap unaries in a step
    def chain(L):
        def fn(x):
            def body(c, _):
                for _ in range(4):
                    c = c * 1.0000001 + 1e-9
                return c, None
            return jax.lax.scan(body, x, None, length=L)[0]
        return jax.jit(fn)
    for L in (16, 128):
        report("scan_4op_chain_1M", L, timed(chain(L), big))
