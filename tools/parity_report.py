"""Generate PARITY.md — this framework's results over every (solver family,
problem) pair in the reference's measured test matrix.

Criterion per pair (reference harness semantics, NaN-aware): from
x0 = (-0.5, ...), some known minimum is within |dx| <= 0.05.  Deterministic
families run once; stochastic families run 8 seeds (vmapped) and PASS on a
majority, since the reference's own evidence per pair is 4 sequential RNG
streams.

Usage: python tools/parity_report.py  (writes PARITY.md at the repo root)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/nlsolver_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

import nlsolver_tpu
from nlsolver_tpu.problems import PROBLEMS
from nlsolver_tpu.solvers import bfgs, cgd, de, gd, nelder_mead, nmpso, pso
from reference_matrix import FAMILIES, PROBLEM_NAME_MAP, full_matrix

TOL = 0.05
N_SEEDS = 8
# multistart retry ladder for pairs the base config fails: the user-facing
# `minimize(..., restarts=k)` meta-driver, escalating (restarts,
# iteration-budget multiplier).  Detail cells record the tier that passed
# (`ms{k}` / `ms{k}x{scale}`) plus the summed evaluation count — the
# fixed, recorded budget the round-3 verdict asked for.
MS_LADDER = ((32, 1), (64, 10))
MS_LADDER_STOCH = ((8, 1), (8, 10))
# bounded tier (round-4 verdict #2): same ladder, but starts sampled
# uniformly inside the problem's CLASSICAL search domain
# (problems/test_functions.py lower/upper) and bounds= forwarded to the
# solver (clamping where the family supports it).  Tags: b-ms{k}[x{s}].
# gd_anneal additionally gets the non-default variant="safeguarded"
# (gradient-norm-guarded anneal step, solvers/gd.py) on the bounded
# ladder, tagged sg-ms{k}[x{s}] — the reference-semantics default config
# is always tried first and stays untouched.

DETERMINISTIC = {
    "nelder_mead": (nelder_mead, nelder_mead.NelderMeadConfig(), "nelder_mead"),
    "bfgs": (bfgs, bfgs.BFGSConfig(), "bfgs"),
    "cgd": (cgd, cgd.CGDConfig(), "cgd"),
    "gd_linesearch": (gd, gd.GDConfig(step_type="linesearch"), "gd"),
    "gd_anneal": (gd, gd.GDConfig(step_type="anneal"), "gd"),
}
STOCHASTIC = {
    "de_random": (de, de.DEConfig(strategy="random"), "de"),
    "de_best": (de, de.DEConfig(strategy="best"), "de"),
    "pso_vanilla": (pso, pso.PSOConfig(accelerated=False), "pso"),
    "pso_accelerated": (pso, pso.PSOConfig(accelerated=True), "pso"),
    "nmpso": (nmpso, nmpso.NMPSOConfig(), "nmpso"),
}


def start(p):
    return jnp.full((p.dim,), -0.5, jnp.float64)


def _scaled(cfg, scale):
    """cfg with its iteration budget multiplied (same algorithm, bigger
    budget — the recorded escalation tier)."""
    if scale == 1 or not hasattr(cfg, "max_iter"):
        return cfg
    import dataclasses

    return dataclasses.replace(cfg, max_iter=cfg.max_iter * scale)


def _domain_bounds(p):
    """The problem's classical search domain as a Bounds, or None."""
    if not p.lower:
        return None
    from nlsolver_tpu.core import Bounds

    return Bounds(
        lower=jnp.asarray(p.lower, jnp.float64),
        upper=jnp.asarray(p.upper, jnp.float64),
    )


def _tiers(family, cfg, ladder):
    """The escalation ladder as (tag, config, restarts, bounds) rows:
    unbounded multistart first, then the bounded (classical-domain) tier,
    then — for gd_anneal only — the safeguarded-variant bounded tier."""
    import dataclasses

    rows = []
    for restarts, scale in ladder:
        tag = f"ms{restarts}" + (f"x{scale}" if scale > 1 else "")
        rows.append((tag, _scaled(cfg, scale), restarts, None))
    for restarts, scale in ladder:
        tag = f"b-ms{restarts}" + (f"x{scale}" if scale > 1 else "")
        rows.append((tag, _scaled(cfg, scale), restarts, "domain"))
    if family == "gd_anneal":
        sg = dataclasses.replace(cfg, variant="safeguarded")
        for restarts, scale in ladder:
            tag = f"sg-ms{restarts}" + (f"x{scale}" if scale > 1 else "")
            rows.append((tag, _scaled(sg, scale), restarts, "domain"))
    return rows


def run_family(family):
    results = {}
    if family in DETERMINISTIC:
        mod, cfg, mname = DETERMINISTIC[family]
        for name, p in PROBLEMS.items():
            if name not in PROBLEM_NAME_MAP.values():
                continue
            res = jax.jit(lambda x0: mod.minimize(p.fn, x0, cfg))(start(p))
            d = float(p.distance_to_nearest_minimum(res.x))
            if d <= TOL:
                results[name] = (True, f"{d:.3f}")
                continue
            # multistart retry ladder (minimize(..., restarts=k) meta-driver),
            # then the bounded (classical-domain) tier, then — gd_anneal
            # only — the safeguarded-variant bounded tier
            for tag, c, r, bspec in _tiers(family, cfg, MS_LADDER):
                b = _domain_bounds(p) if bspec else None
                if bspec and b is None:
                    continue
                res = jax.jit(
                    lambda x0, k, c=c, r=r, b=b: nlsolver_tpu.minimize(
                        p.fn, x0, method=mname, config=c, key=k, restarts=r,
                        bounds=b,
                    )
                )(start(p), jax.random.key(7))
                dm = float(p.distance_to_nearest_minimum(res.x))
                if dm <= TOL:
                    results[name] = (
                        True,
                        f"{tag}:{dm:.3f},nfev={int(res.function_calls)}",
                    )
                    break
            else:
                results[name] = (False, f"{d:.3f}" if d == d else "nan")
    else:
        mod, cfg, mname = STOCHASTIC[family]
        for name, p in PROBLEMS.items():
            if name not in PROBLEM_NAME_MAP.values():
                continue
            keys = jax.random.split(jax.random.key(42), N_SEEDS)
            res = jax.jit(
                jax.vmap(lambda k: mod.minimize(p.fn, start(p), cfg, key=k))
            )(keys)
            dists = jax.vmap(p.distance_to_nearest_minimum)(res.x)
            n_pass = int(jnp.sum(dists <= TOL))
            if n_pass >= N_SEEDS // 2:
                results[name] = (True, f"{n_pass}/{N_SEEDS}")
                continue
            for tag, c, r, bspec in _tiers(family, cfg, MS_LADDER_STOCH):
                b = _domain_bounds(p) if bspec else None
                if bspec and b is None:
                    continue
                res = jax.jit(
                    jax.vmap(
                        lambda k, c=c, r=r, b=b: nlsolver_tpu.minimize(
                            p.fn, start(p), method=mname, config=c, key=k,
                            restarts=r, bounds=b,
                        )
                    )
                )(keys)
                dists_m = jax.vmap(p.distance_to_nearest_minimum)(res.x)
                n_pass_m = int(jnp.sum(dists_m <= TOL))
                if n_pass_m >= N_SEEDS // 2:
                    results[name] = (True, f"{tag}:{n_pass_m}/{N_SEEDS}")
                    break
            else:
                results[name] = (False, f"{n_pass}/{N_SEEDS}")
    return results


def reference_results():
    """family -> problem -> fraction of that family's configs that pass."""
    per = {}
    for fam, pred in FAMILIES.items():
        per[fam] = {}
    for solver, problem, ok in full_matrix():
        for fam, pred in FAMILIES.items():
            if pred(solver):
                per[fam].setdefault(problem, []).append(ok)
    return {
        fam: {prob: sum(oks) / len(oks) for prob, oks in probs.items()}
        for fam, probs in per.items()
    }


TRAJECTORY_SECTION = """
## Trajectory-level parity (tests/test_trajectory_parity.py)

Beyond final optima, per-iterate trajectories are compared against golden
per-prefix runs of the reference binary (tools/traj_probe.cpp -> 
tests/data/reference_trajectories.tsv; 49 solver/problem pairs covering
every solver family that compiles):

| class | pairs | result |
|---|---|---|
| bit-exact iterates (dx == 0 at every prefix) | 30 | Nelder-Mead, Brent minimizer, 6 of 7 root finders, and the stochastic families replayed draw-for-draw on the bit-parity reference RNGs: DE (rand/best x xorshift/xoshiro/recurrent/halton + a registered std::mt19937 user generator), SANN (xorshift/xoshiro/recurrent), Accelerated PSO (xorshift/xoshiro), NM-PSO hybrid (xorshift/xoshiro) |
| counter-exact, iterates within documented FMA-contraction drift | 19 | GD (fixed/anneal/bigstep/linesearch/PAGE), CGD, BFGS, LM, false-position (1 ulp) |
| excluded with cause | - | vanilla PSO (out-of-bounds read, nlsolver.h:2674 -> allocator-dependent UB); CMA-ES (reference does not compile) |
"""


def main():
    ref = reference_results()
    fams = list(DETERMINISTIC) + list(STOCHASTIC)
    problems = sorted({p for fam in ref.values() for p in fam})

    ours = {}
    for fam in fams:
        print(f"running {fam}...", flush=True)
        ours[fam] = run_family(fam)

    lines = [
        "# PARITY — nlsolver_tpu vs. reference binary",
        "",
        "Criterion: from x0=(-0.5,...), some known minimum within |dx| <= 0.05",
        "(the reference harness's check, made NaN-aware).  Reference column =",
        "fraction of that family's RNG configs that pass in",
        "`reference_test_matrix.tsv`; ours = single run (deterministic) or",
        f"pass count over {N_SEEDS} seeds (stochastic), PASS on majority.",
        "",
        "Pairs the base config fails are retried through the public",
        "multistart meta-driver `minimize(..., restarts=k)` on an",
        f"escalating (restarts, max_iter-multiplier) ladder: {MS_LADDER}",
        f"(deterministic) / {MS_LADDER_STOCH} per seed (stochastic),",
        "run twice: first unbounded (tags `ms{k}[x{scale}]`), then with",
        "starts sampled inside the problem's CLASSICAL search domain and",
        "bounds= forwarded to the solver (tags `b-ms{k}[x{scale}]` — the",
        "bounded tier, honestly labeled: the reference never searches",
        "outside-in).  gd_anneal gets one further labeled tier",
        "(`sg-ms{k}[x{scale}]`): the NON-DEFAULT variant=\"safeguarded\"",
        "anneal (gradient-norm-guarded step, solvers/gd.py) on the bounded",
        "ladder; the reference-semantics default is always tried first.",
        "The reference has no multistart; its harness gives every solver",
        "one trajectory per RNG config.",
        "",
        "| family | problem | reference | ours | verdict |",
        "|---|---|---|---|---|",
    ]
    must_pass = 0
    must_pass_ok = 0
    bonus = 0
    for fam in fams:
        for prob in problems:
            r = ref[fam].get(prob)
            o = ours[fam].get(prob)
            if r is None or o is None:
                continue
            ours_pass, detail = o
            ref_str = f"{r:.0%}"
            if r > 0:
                must_pass += 1
                must_pass_ok += int(ours_pass)
                verdict = "OK" if ours_pass else "**REGRESSION**"
            else:
                verdict = "**bonus**" if ours_pass else "-"
                bonus += int(ours_pass)
            lines.append(
                f"| {fam} | {prob} | {ref_str} | "
                f"{'PASS' if ours_pass else 'FAIL'} ({detail}) | {verdict} |"
            )
    # raw-row accounting: each family-level bonus pair spans several
    # reference RNG-config rows in reference_test_matrix.tsv
    bonus_pairs = {
        (fam, prob)
        for fam in fams
        for prob in problems
        if ref.get(fam, {}).get(prob) == 0.0
        and ours[fam].get(prob, (False,))[0]
    }
    raw_fail = 0
    raw_covered = 0
    for solver, problem, ok in full_matrix():
        if ok:
            continue
        raw_fail += 1
        for fam, pred in FAMILIES.items():
            if pred(solver) and (fam, problem) in bonus_pairs:
                raw_covered += 1
    lines += [
        "",
        f"**Summary:** reference-passing pairs covered: {must_pass_ok}/{must_pass};"
        f" pairs the reference fails but this framework solves: {bonus}"
        f" family-level, covering **{raw_covered} of the {raw_fail}** raw"
        " (solver, problem, RNG) rows the reference's own harness records"
        " as failing.",
        "",
        "Residual failures are solver-structural, not budget-bound.",
        "Bukin N6 resists every family and every tier — including",
        "bounded population search inside its classical domain and a",
        "dedicated heavy-budget probe (DE pop=64 x 10k iters, NM ms256,",
        "PSO 64x50k, all bounded): the |y-0.01x^2|^(1/2) ridge is flat to",
        "~0.01|x+10| along its floor with dense micro-local minima, so no",
        "solver in the reference's catalogue locates (-10, 1) to 0.05",
        "(the reference itself fails all 22 configs).  cgd",
        "schaffer_n2/shekel and gd_anneal ackley/rastrigin remain: CGD",
        "zigzags into the plateau/local wells from every sampled start,",
        "and even the safeguarded anneal converges to the nearest local",
        "minimum on the dense-multimodal pair.",
        "",
        "(CMA-ES, SANN, LM, Brent and the root finders have no reference test",
        "coverage — see their dedicated test files.)",
        TRAJECTORY_SECTION,
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {must_pass_ok}/{must_pass} reference passes covered, {bonus} bonus")


if __name__ == "__main__":
    main()
