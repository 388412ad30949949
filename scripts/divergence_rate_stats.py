"""Exact statistics for the ours-vs-reference e200 divergence-rate question.

RESULTS.md ("Divergence rate: ours vs the reference") asks whether the
reference recipe (torch AdamW + its exact init/stream,
/root/reference/src/fdiff/models/score_models.py) is *systematically*
cleaner at the published 200-epoch budget than our TPU trainer, or
whether its clean draws are just clean seeds from the same heavy-tailed
per-run distribution. This script turns that paragraph into numbers:

1. **Exact permutation test** on per-run divergent-chain counts: under
   the null that reference runs are exchangeable with ours, enumerate
   every way to relabel ``n_ref`` of the pooled runs as "reference" and
   report the fraction with a total count <= the observed reference
   total (one-sided: "ref cleaner").  Exact — no asymptotics, valid at
   N as small as ours.
2. **P(all-ref-clean)** under the null, with a Jeffreys interval on our
   clean-run fraction.
3. **Rate ratio** with an exact conditional binomial CI (chains pooled;
   reported for completeness — the per-run test above is the honest one
   because chains within a run share weights and are not independent
   draws of the training knife-edge).

Per-run counts are read from committed ``results.yaml`` /
``results_cross_our_sampler.yaml`` files when they carry the
``divergence_census_count`` field (cli/sample.py writes it since round
4 session 6), with a built-in registry for the older runs whose counts
were recorded in RESULTS.md before the field existed.

Usage:
    python scripts/divergence_rate_stats.py            # registry only
    python scripts/divergence_rate_stats.py --scan     # + scan runs*/
"""

from __future__ import annotations

import argparse
from itertools import combinations
from math import comb
from pathlib import Path

import yaml
from scipy.stats import beta

# Per-run divergent-chain counts at the published protocol
# (10k samples x 1000 EM steps, guard off, threshold absmax>8).
# Provenance: RESULTS.md seed-study table + queue J/K/M/N commits
# (each count's run dir is named in its commit message).
OURS = {
    "fused_s42": 89,
    "fused_s43": 0,
    "fused_s44": 5,
    "fused_s45": 0,
    "fused_s46": 0,
    "fused_s47": 4,
    "fused_s48": 59,
    "fused_s49": 0,
    "fused_s50": 0,
    "fused_s51": 0,
    "fused_s52": 1,
    "unfused_s42": 2,
    "unfused_s43": 0,
    "unfused_s44": 19,
    "unfused_s45": 1,
    "unfused_s46": 0,
    "unfused_s47": 2,
    "unfused_s48": 92,
    "unfused_s49": 0,
    "unfused_s50": 0,
    "unfused_s51": 0,
    "unfused_s52": 1,
}
REF = {
    "ref_s42": 0,   # runs_reference/ref-freq42-e200 cross-sample census
    "ref_s43": 31,  # runs_reference/ref-freq43-e200 cross-sample census
}
CHAINS_PER_RUN = 10_000

# Committed census dirs predating the provenance fields, mapped to
# their registry identity (from the queue commit messages) so a scan
# never double-counts them against the registry rows above.
LEGACY_DIRS = {
    "3bec787d_10k_off": "fused_s49",
    "b2cb191b_10k_off": "unfused_s49",
    "9834397e_10k_off": "fused_s50",
    "5055c848_10k_off": "unfused_s50",
    "001b4ff5_10k_off": "fused_s51",
    "24f308de_10k_off": "unfused_s51",
    "cc29f244_10k_off": "fused_s52",
    "82f96748_10k_off": "unfused_s52",
}
PROTOCOL = {"num_samples": 10_000, "num_diffusion_steps": 1_000, "method": "em"}
# Arms admitted into the e200 seed-study table; anything else (f600
# flagship censuses, probe arms, ...) is reported and skipped.
STUDY_ARMS = {"fused", "unfused", "reference"}


def scan(root: Path, into: dict[str, int], suffix: str) -> None:
    """Pool census counts by PROVENANCE, not directory name.

    Runs written since the provenance fields exist are admitted only
    when they match the published protocol with the guard off, and are
    keyed by (arm, train seed) so bit-identical recreates of a registry
    seed dedup instead of double-counting (ADVICE r04, medium). Older
    runs are admitted only through the explicit LEGACY_DIRS map.
    """
    for res in sorted(root.glob(f"*/{suffix}")):
        name = res.parent.name
        try:
            payload = yaml.safe_load(res.read_text())
        except Exception:
            continue
        if not isinstance(payload, dict):
            continue
        count = payload.get("divergence_census_count")
        if count is None:
            continue
        proto = payload.get("divergence_census_protocol")
        if proto is None:  # legacy run: identity known only via git log
            if name in LEGACY_DIRS:
                into.setdefault(LEGACY_DIRS[name], int(count))
            elif name.endswith("_10k_off"):
                print(f"  [scan] skipping {name}: census without provenance "
                      f"and not in LEGACY_DIRS (identity unknown)")
            continue
        if payload.get("divergence_census_guard_active"):
            continue  # post-guard residual, not a raw knife-edge census
        if any(proto.get(k) != v for k, v in PROTOCOL.items()):
            continue  # different protocol (pc/ode, short ladder, ...)
        arm = proto.get("arm")
        seed = proto.get("train_seed")
        if arm is None or seed is None:
            print(f"  [scan] skipping {name}: protocol matches but no "
                  f"arm/train_seed tag (set FDIFF_CENSUS_ARM when censusing)")
            continue
        if arm not in STUDY_ARMS:
            # A census at the study protocol but from a different
            # training budget/shape (e.g. a 600-epoch flagship run
            # tagged "flagship_f600") must not enter the e200 table.
            print(f"  [scan] skipping {name}: arm {arm!r} is not part of "
                  f"the e200 seed study ({sorted(STUDY_ARMS)})")
            continue
        key = f"ref_s{seed}" if arm == "reference" else f"{arm}_s{seed}"
        into.setdefault(key, int(count))


def permutation_p(ours: list[int], ref: list[int]) -> tuple[float, int]:
    """Exact one-sided p: P(random n_ref-subset total <= ref total)."""
    pooled = ours + ref
    n_ref = len(ref)
    target = sum(ref)
    hits = total = 0
    for idx in combinations(range(len(pooled)), n_ref):
        total += 1
        if sum(pooled[i] for i in idx) <= target:
            hits += 1
    return hits / total, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", action="store_true",
                    help="also scan runs/*/results.yaml and runs_reference/"
                         "*/results_cross_our_sampler.yaml for census fields")
    args = ap.parse_args()

    ours, ref = dict(OURS), dict(REF)
    if args.scan:
        pooled: dict[str, int] = {**ours, **ref}
        scan(Path("runs"), pooled, "results.yaml")
        scan(Path("runs_reference"), pooled, "results_cross_our_sampler.yaml")
        for key, count in pooled.items():
            (ref if key.startswith("ref_") else ours).setdefault(key, count)

    o_counts = sorted(ours.values())
    r_counts = sorted(ref.values())
    n_o, n_r = len(o_counts), len(r_counts)

    print(f"ours: {n_o} runs, counts {o_counts}")
    print(f"ref : {n_r} runs, counts {r_counts}")

    p_perm, n_subsets = permutation_p(list(ours.values()), list(ref.values()))
    print(f"\nexact permutation test (H0: ref runs exchangeable with ours; "
          f"H1: ref cleaner)\n  one-sided p = {p_perm:.3f}  "
          f"({n_subsets} subsets enumerated)")
    if p_perm > 0.05:
        print("  -> the reference observations are consistent with the "
              "null: no evidence its recipe is systematically cleaner")
    else:
        print("  -> the reference runs are cleaner than exchangeability "
              "allows: the knife edge is (at least partly) ours")

    clean_o = sum(c == 0 for c in o_counts)
    p_clean = clean_o / n_o
    lo, hi = beta.ppf([0.025, 0.975], clean_o + 0.5, n_o - clean_o + 0.5)
    p_all_clean = p_clean ** n_r
    print(f"\nP(clean run) ours = {clean_o}/{n_o} = {p_clean:.2f} "
          f"(Jeffreys 95% [{lo:.2f}, {hi:.2f}])")
    print(f"P(all {n_r} ref runs clean | null) = {p_all_clean:.2f}")

    k_o, k_r = sum(o_counts), sum(r_counts)
    t_o, t_r = n_o * CHAINS_PER_RUN, n_r * CHAINS_PER_RUN
    print(f"\npooled chain rates (FYI only; chains within a run are not "
          f"independent draws of the knife edge):")
    print(f"  ours {k_o}/{t_o} = {k_o / t_o:.2e}   "
          f"ref {k_r}/{t_r} = {k_r / t_r:.2e}")
    # Exact conditional test: given k_o + k_r events, k_r ~ Binomial
    # under equal rates with success prob t_r/(t_o+t_r).
    from scipy.stats import binom
    p_cond = binom.cdf(k_r, k_o + k_r, t_r / (t_o + t_r))
    print(f"  exact conditional P(ref count <= {k_r}) = {p_cond:.3f}")


if __name__ == "__main__":
    main()
