"""Integration test (physics): two colliding elastic droplets run through the
full Verlet + cell-list + binary-operator stack for 1 s of simulated time;
particle count must stay constant and total energy drift < 1% — the
end-to-end conservation gate of the reference suite
(sph_jl/tests/test_collision_2d.jl)."""
import jax
import jax.numpy as jnp
import numpy as np

from sph_mountain_waves_tpu import (
    Circle, Grid, ParticleSystem, Rectangle, generate_particles,
)
from sph_mountain_waves_tpu.kernels import rDwendland2, wendland2
from sph_mountain_waves_tpu.ops.apply import apply_binary, apply_unary
from sph_mountain_waves_tpu.models.common import frame_runner, masked_sum

# constants (test_collision_2d.jl:12-31)
DR = 2.0e-2
H = 2.4 * DR
RHO0 = 1000.0
M = RHO0 * DR**2
C = 20.0
V0 = 1.0
CIRC_RAD = 0.4
DOM_LEN = 20.0
DELTA_X = 1.0
DELTA_Y = 0.2
DT = 0.1 * H / C
T_END = 1.0
DT_FRAME = T_END / 10


def make_system():
    grid = Grid(DR, "square")
    circ1 = Circle(-0.5 * DELTA_X, -0.5 * DELTA_Y, CIRC_RAD)
    circ2 = Circle(0.5 * DELTA_X, 0.5 * DELTA_Y, CIRC_RAD)
    domain = Rectangle(-0.5 * DOM_LEN, -0.5 * DOM_LEN, 0.5 * DOM_LEN, 0.5 * DOM_LEN)
    sys = ParticleSystem(
        fields={"x": 2, "v": 2, "a": 2, "P": 0, "rho": 0, "rho0": 0},
        domain=domain, h=H, dim=2, dtype=jnp.float64)
    generate_particles(sys, grid, circ1, lambda xs: {"v": np.array([V0, 0.0])})
    generate_particles(sys, grid, circ2, lambda xs: {"v": np.array([-V0, 0.0])})
    return sys


def find_rho(p, q, r):
    return {"rho": q.rho * 0 + M * wendland2(H, r)}


def find_rho0(p, q, r):
    return {"rho0": q.rho * 0 + M * wendland2(H, r)}


def find_pressure(u):
    return {"P": C**2 * (u.rho - u.rho0)}


def internal_force(p, q, r):
    ker = M * rDwendland2(H, r)
    return {"a": (-(ker * (p.P / RHO0**2 + q.P / RHO0**2)))[..., None] * (p.x - q.x)}


def reset_a(u):
    return {"a": jnp.zeros_like(u.a)}


def reset_rho(u):
    return {"rho": jnp.zeros_like(u.rho)}


def move(u):
    return {"x": u.x + DT * u.v}


def accelerate(u):
    return {"v": u.v + 0.5 * DT * u.a}


def energy(state):
    f = state.fields
    kinetic = 0.5 * M * jnp.sum(f["v"] ** 2, axis=-1)
    internal = 0.5 * M * C**2 * (f["rho"] - f["rho0"]) ** 2 / RHO0**2
    return masked_sum(kinetic + internal, state.active)


def test_collision_energy_conservation():
    sys = make_system()
    state = sys.freeze()
    eng = sys.engine

    def step(state):
        # verlet_step! (test_collision_2d.jl:104-114)
        state = apply_unary(state, accelerate)
        state = apply_unary(state, move)
        state, nbrs = eng.rebuild(state)
        state = apply_unary(state, reset_rho)
        state = apply_binary(eng, state, nbrs, find_rho, self_interaction=True)
        state = apply_unary(state, find_pressure)
        state = apply_unary(state, reset_a)
        state = apply_binary(eng, state, nbrs, internal_force)
        state = apply_unary(state, accelerate)
        return state

    # initialization (test_collision_2d.jl:121-126)
    @jax.jit
    def init(state):
        state, nbrs = eng.rebuild(state)
        state = apply_binary(eng, state, nbrs, find_rho0, self_interaction=True,
                             add=False)
        state = apply_binary(eng, state, nbrs, find_rho, self_interaction=True,
                             add=False)
        state = apply_unary(state, find_pressure)
        state = apply_binary(eng, state, nbrs, internal_force)
        return state

    state = init(state)
    steps_per_frame = int(round(DT_FRAME / DT))
    run_frame = frame_runner(step, steps_per_frame)

    Ns, Es = [], []
    for k in range(10):
        state = run_frame(state)
        Ns.append(int(state.n))
        Es.append(float(energy(state)))

    # count particles (test_collision_2d.jl:141-143)
    assert all(n == Ns[0] for n in Ns)
    # energy conservation < 1% (:144-147)
    Es = np.asarray(Es)
    assert np.max(Es / Es[0] - 1.0) < 1e-2
