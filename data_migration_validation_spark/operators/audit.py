"""Write-audit-publish audits: data-quality gates evaluated against a
STAGED commit before it becomes visible.

This is the reference's validation surface (null checks
src/validate.py:95-110, format validators docs/script.js:36-46,273-306,
duplicate keys src/validate.py:85-92) promoted from after-the-fact
reporting to an ingestion gate: the apply engine stages each epoch's
commit (``LakeTable.commit(publish=False)``), runs the audit over the
files that commit ADDED, and only publishes the snapshot if every check
returns zero violations — bad data never becomes readable state, and a
rejected epoch leaves the table untouched (Iceberg's WAP pattern).

Two execution modes, one check spec:

* **classic** (default): ONE aggregation job over the staged files —
  every check is a conditional-sum column in a single ``agg``; the
  staged files of a merge-on-read epoch are the epoch's winners, so the
  cost is one O(epoch) scan regardless of table size. Measured ~1.1 s
  per 52k-event epoch, dominated by the extra job's fixed cost
  (BENCH.md "Write-audit-publish overhead").
* **inline** (``inline=True``): the SAME aggregates are attached to the
  merge plan via ``DataFrame.observe``, so the staging WRITE collects
  them — ZERO extra Spark jobs. The one check inline cannot run is the
  exact ``duplicate_keys`` count (observations forbid distinct
  aggregates); the LWW merge already guarantees one winner per key per
  commit, so that check is structural there rather than load-bearing.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AuditFn = Callable[[DataFrame], dict[str, int]]

# Reference format regexes (docs/script.js:36-42), reused by the CLI's
# default ingest audit for the engine's page envelope.
URL_RE = r"^https?://\S+$"


class AuditSpec:
    """A named set of data-quality checks, runnable either as one
    aggregation job over a staged DataFrame (``audit(df)``) or as
    observation expressions collected during the staging write
    (``agg_exprs`` + ``postprocess`` — used by the engine when
    ``inline`` is True). See :func:`standard_audit` for check
    semantics."""

    def __init__(
        self,
        key_col: str,
        not_null: Sequence[str],
        rules: Sequence[tuple],
        max_delete_fraction: float | None,
        min_rows_for_fraction: int,
        inline: bool,
    ):
        self.key_col = key_col
        self.not_null = tuple(not_null)
        self.rules = tuple(rules)
        self.max_delete_fraction = max_delete_fraction
        self.min_rows_for_fraction = min_rows_for_fraction
        self.inline = inline

    def agg_exprs(self, columns: Sequence[str], distinct_ok: bool = False) -> list[Column]:
        """The checks as aggregate Columns over a frame with ``columns``.
        ``distinct_ok=False`` (the observe() constraint) drops the exact
        duplicate-key count. Checks whose columns are absent are skipped
        (schema evolution mid-stream must not fail the audit itself)."""
        live = ~F.col("deleted") if "deleted" in columns else F.lit(True)
        aggs = [F.sum(F.col(self.key_col).isNull().cast("long")).alias("null_key")]
        if distinct_ok:
            # non-null keys minus distinct keys: null keys are counted by
            # null_key alone, never double-reported as duplicates
            aggs.append(
                (F.count(F.col(self.key_col)) - F.count_distinct(F.col(self.key_col))).alias(
                    "duplicate_keys"
                )
            )
        else:
            # observe() forbids distinct aggregates, but
            # approx_count_distinct (HyperLogLog++) IS observable: count −
            # approx_distinct keeps a duplicate-key SIGNAL in the
            # always-on inline mode. HLL under-/over-estimates by ~rsd, so
            # small negatives are expected on clean data — postprocess
            # clamps at 0 and the threshold below absorbs estimator noise
            # (a merge-invariant break duplicates a large fraction of the
            # commit, far above 2.5% of distinct keys).
            aggs.append(
                (
                    F.count(F.col(self.key_col))
                    - F.approx_count_distinct(self.key_col, rsd=0.01)
                ).alias("_dup_keys_raw")
            )
        for c in self.not_null:
            if c in columns:
                aggs.append(
                    F.sum((live & F.col(c).isNull()).cast("long")).alias(f"null_{c}")
                )
        for rule in self.rules:
            name, pred = rule[0], rule[1]
            required = rule[2] if len(rule) > 2 else ()
            if any(c not in columns for c in required):
                continue
            # violation = live row where the predicate is not True
            # (null-safe: a null predicate result is a violation too)
            aggs.append(
                F.sum((live & ~pred.eqNullSafe(F.lit(True))).cast("long")).alias(name)
            )
        if self.max_delete_fraction is not None and "deleted" in columns:
            aggs.append(F.sum((~live).cast("long")).alias("_n_deleted"))
        if (self.max_delete_fraction is not None and "deleted" in columns) or not distinct_ok:
            # row count feeds the delete-storm fraction and/or the
            # approx-duplicate noise band
            aggs.append(F.count("*").alias("_n_rows"))
        return aggs

    def postprocess(self, row: dict) -> dict[str, int]:
        """Raw aggregate values → ``{check: violation_count}`` (the
        delete-storm fraction rule and the approximate duplicate-key
        threshold resolve here)."""
        out = {k: int(v or 0) for k, v in row.items() if not k.startswith("_")}
        if "_dup_keys_raw" in row:
            # flag only when the excess exceeds the HLL estimator's noise
            # band (rsd=1% → 2.5% guard): a real merge-invariant break
            # duplicates rows wholesale, not fractionally
            raw = int(row["_dup_keys_raw"] or 0)
            n = int(row.get("_n_rows") or 0)
            noise = max(3.0, 0.025 * n)
            out["duplicate_keys_approx"] = raw if raw > noise else 0
        if self.max_delete_fraction is not None and "_n_rows" in row:
            n, d = int(row["_n_rows"] or 0), int(row["_n_deleted"] or 0)
            out["delete_storm"] = int(
                n >= self.min_rows_for_fraction and d > self.max_delete_fraction * n
            )
        return out

    def __call__(self, staged: DataFrame) -> dict[str, int]:
        row = staged.agg(*self.agg_exprs(staged.columns, distinct_ok=True)).collect()[0]
        return self.postprocess(row.asDict())  # exactly one Spark job


def standard_audit(
    key_col: str = "url",
    not_null: Sequence[str] = (),
    rules: Sequence[tuple[str, Column] | tuple[str, Column, Sequence[str]]] = (),
    max_delete_fraction: float | None = None,
    min_rows_for_fraction: int = 100,
    inline: bool = False,
) -> AuditSpec:
    """Build an audit for :meth:`CDCApplyEngine.apply_epoch`.

    Always checks ``null_key`` (a row with no key); in classic mode also
    ``duplicate_keys`` (two rows for one key within the audited commit —
    the LWW merge guarantees at most one winner per key per commit, so a
    nonzero count means the merge invariant broke). ``not_null`` adds a
    null-count check per named column; ``rules`` adds named format checks
    — each ``(name, predicate)`` or ``(name, predicate, required_cols)``
    where the predicate is a boolean Column that is True for GOOD rows
    (violations = rows where it is null-safely not True). Checks whose
    named/required columns the staged commit doesn't carry are skipped.

    ``max_delete_fraction`` adds a **delete-storm guard**: if the staged
    commit is more than this fraction tombstones (and has at least
    ``min_rows_for_fraction`` rows — tiny epochs are legitimately
    delete-heavy), the ``delete_storm`` check reports 1. This is the gate
    that catches an upstream table truncation / bad filter turning into a
    CDC flood of deletes — the one mistake a LWW engine happily and
    irreversibly applies. Folds into the same single aggregation.

    ``inline=True`` asks the engine to collect the checks DURING the
    staging write via ``DataFrame.observe`` — zero extra jobs, no exact
    duplicate-key count (distinct aggregates are not observable).

    The audit returns ``{check_name: violation_count}`` — all zeros ⇒
    publish. Tombstone rows (``deleted=true``) are exempt from
    ``not_null`` and ``rules`` (a delete's payload is contractually
    null) but still count for ``null_key``/``duplicate_keys``.
    """
    return AuditSpec(
        key_col=key_col,
        not_null=not_null,
        rules=rules,
        max_delete_fraction=max_delete_fraction,
        min_rows_for_fraction=min_rows_for_fraction,
        inline=inline,
    )


def page_envelope_audit(
    max_delete_fraction: float | None = None, inline: bool = False
) -> AuditSpec:
    """The engine's default ingest gate for the web-page envelope
    (BASELINE.json input_hint: url/warc_ts/html/text/lang): well-formed
    urls, order columns present, and non-null extracted text wherever the
    event carried html. ``max_delete_fraction`` optionally arms the
    delete-storm guard (off by default: a small table legitimately sees
    delete-heavy epochs; arm it once normal traffic shape is known).
    ``inline`` collects the checks during the staging write (no extra
    jobs)."""
    html_implies_text = F.col("html").isNull() | F.col("text").isNotNull()
    return standard_audit(
        key_col="url",
        not_null=("warc_ts", "seq"),
        rules=[
            ("bad_url_format", F.col("url").rlike(URL_RE)),
            ("html_without_text", html_implies_text, ("html", "text")),
        ],
        max_delete_fraction=max_delete_fraction,
        inline=inline,
    )
