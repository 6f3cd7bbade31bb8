"""Checkpoint/resume for the reference-emulation solvers.

The reference's only resumable state is its RNGs' ``get_state``/``set_state``
(nlsolver.h:1204-1221, :1324-1337) — resuming a solver run there is
impossible because solver-local state dies on return (SURVEY.md §5).  Here
the emulation state is a pytree CONTAINING the bit-parity RNG state, so
save -> restart-process -> load -> step yields the *identical* stream and
the identical trajectory.  This test proves the strongest version of that:
a run checkpointed mid-flight and resumed must land on bit-identical
iterates to the uninterrupted golden reference trajectory.
"""
import jax
import jax.numpy as jnp
import pytest

from nlsolver_tpu.core.driver import drive_scan
from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import de_reference, sann_reference
from nlsolver_tpu.utils import checkpoint

from trajectory_common import load_golden

X0 = (-0.5, -0.5)


@pytest.mark.parametrize("family", ["de", "sann"])
def test_resume_matches_golden(tmp_path, family):
    fn = PROBLEMS["rosenbrock"].fn
    x0 = jnp.asarray(X0, jnp.float64)
    golden = load_golden()
    if family == "de":
        mod, cfg = de_reference, de_reference.DEReferenceConfig(max_iter=100)
        rows = golden[("de_rand_xorshift", "rosenbrock")]
    else:
        mod, cfg = sann_reference, sann_reference.SANNReferenceConfig(max_iter=100)
        rows = golden[("sann_xorshift", "rosenbrock")]
    row = next(r for r in rows if r["k"] == 20)

    # run 8 iterations, checkpoint, reload into a FRESH init-shaped state,
    # run 12 more — exactly the reference's max_iter=20 prefix
    step = jax.jit(lambda s: mod.step(fn, s, cfg))
    state = mod.init(fn, x0, cfg)
    state = drive_scan(lambda s: mod.step(fn, s, cfg), state, 8)
    path = str(tmp_path / "state.npz")
    checkpoint.save(path, state)

    fresh = mod.init(fn, x0, cfg)      # structure donor only
    resumed = checkpoint.load(path, fresh)
    final = drive_scan(lambda s: mod.step(fn, s, cfg), resumed, 12)

    if family == "de":
        b = de_reference.report_best(final)
        x = final.agents[b]
    else:
        x = final.x
    assert int(final.iteration) == row["iters"] == 20
    assert int(final.nfev) == row["nfev"]
    for ours, ref in zip([float(v) for v in x], row["x"]):
        assert ours == ref, (ours, ref)   # bit-exact across the checkpoint
