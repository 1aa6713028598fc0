"""Leakage-safe dataset splitting.

A naive per-document train/val/test split leaks: near-duplicate
documents land in different splits and the eval set is contaminated by
training text (the same failure mode benchmark decontamination guards
against, but introduced by the split itself). The fix is to split by
*near-dup component*, not by document: every member of a connected
near-duplicate cluster is assigned to the split of its canonical
(min-id) representative, so a cluster can never straddle a boundary.

Reference parity note: the reference flow (final_template.xml) has no
dataset-split concept — this is a driver-mandated extension operator
(SURVEY.md §2.9) for the training-data pipeline family, composed from
the engine's own dedup clustering (operators/cluster.py) and the
deterministic LCG sampler (operators/sampling.py).

Scale: the component labeling is |nodes-in-pairs| rows (the duplicate
subset); the join back to the corpus is one hash join on the id, and
the split assignment itself is a map-only LCG hash of the canonical
id — no extra shuffle beyond what :func:`canonical_docs` already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cluster import canonical_docs
from .sampling import _LCG_RANGE, sample_hash


def assign_split(
    canonical_col,
    fractions: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
) -> F.Column:
    """Split label from the deterministic 31-bit hash of the canonical
    id: the [0, 2^31) hash range is partitioned into contiguous bands
    proportional to ``fractions``. Pure integer arithmetic → replayable
    and engine-independent (the oracle repeats it verbatim)."""
    if len(fractions) != len(names):
        raise ValueError("fractions and names must align")
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {sum(fractions)}")
    h = sample_hash(canonical_col)
    expr = F.lit(names[-1])
    cum = 0.0
    bounds = []
    for frac in fractions[:-1]:
        cum += frac
        bounds.append(int(cum * _LCG_RANGE))
    for name, bound in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return expr


def split_bounds_sql(
    fractions: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
    id_expr: str = "canonical_id",
) -> str:
    """The equivalent ANSI-SQL CASE expression for oracle construction
    (same LCG constants as :func:`sampling.lcg_where_sql`)."""
    h = (
        f"(({id_expr} % 2147483647) * 1103515245 + 12345) % 2147483648"
    )
    cum = 0.0
    whens = []
    for name, frac in zip(names[:-1], fractions[:-1]):
        cum += frac
        whens.append(f"WHEN {h} < {int(cum * _LCG_RANGE)} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    fractions: tuple[float, ...] = (0.9, 0.05, 0.05),
    names: tuple[str, ...] = ("train", "val", "test"),
) -> DataFrame:
    """(``doc_id``, ``canonical_id``, ``split``) with every near-dup
    component entirely inside one split.

    ``pairs`` is a verified near-duplicate pair set (e.g. the output of
    ``minhash_lsh_candidates`` → ``verify_candidate_pairs``). Documents
    not in any pair are their own singleton component. The guarantee:
    ``split`` is a function of ``canonical_id`` alone, so two documents
    with any transitive near-dup relation always share a split.
    """
    canon = canonical_docs(docs, pairs, id_col, a_col, b_col)
    return canon.select(
        id_col,
        "canonical_id",
        assign_split(F.col("canonical_id"), fractions, names).alias("split"),
    )
