"""Declarative data-quality check runner (SURVEY §5).

Reimplements the assertion vocabulary of the reference's dbt test
suite (dbt/models/*/_*__models.yml, dbt/macros/tests/*.sql,
dbt/tests/no_lost_videos.sql) as DataFrame programs.  dbt semantics
throughout: a check *passes* when its violation query returns zero
rows.

Scale design — checks are grouped by physical shape, not run one
query per assertion:

- **Row checks** (not_null / accepted_values / expression / regex /
  like) are pure per-row predicates.  All row checks against one
  table compile into a SINGLE aggregate scan over that table
  (``agg(sum(when(violated, 1)))`` per check), so 50 assertions on a
  100 TB table cost one pass, not 50.
- **Key checks** (unique / unique_combination) need a shuffle on the
  key; each compiles to groupBy(key).count > 1.
- **Ref checks** (relationships) compile to a distinct + left-anti
  join against the parent — broadcast when the parent is a dimension.
- **Compare checks** (equal_rowcount, duration_match,
  tracks_count_match, conservation) are tiny scalar-aggregate
  comparisons.
- **Type checks** (expect_column_values_to_be_of_type) read the
  schema only — no job at all.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    table: str
    name: str
    failures: int

    @property
    def passed(self) -> bool:
        return self.failures == 0

    def __str__(self) -> str:  # pragma: no cover - repr sugar
        mark = "ok  " if self.passed else "FAIL"
        return f"{mark} {self.table}: {self.name} ({self.failures} failures)"


def _where(df: DataFrame, where: str | Column | None) -> DataFrame:
    if where is None:
        return df
    return df.filter(where)


@dataclass
class CheckSet:
    """A suite of checks over a named collection of DataFrames.

    Registration methods mirror the dbt test vocabulary; ``run()``
    executes the whole suite with per-table scan fusion.
    """

    tables: dict[str, DataFrame]
    # (table, name, violation Column) — fused into one scan per table
    _row_checks: list[tuple[str, str, Column]] = field(default_factory=list)
    # (table, name, thunk) — each thunk returns a failure count
    _job_checks: list[tuple[str, str, object]] = field(default_factory=list)
    # (table, name, failures) — resolved at registration (schema-only)
    _static: list[tuple[str, str, int]] = field(default_factory=list)

    # ------------------------------------------------------ row checks
    def _row(self, table: str, name: str, violated: Column, where: str | Column | None) -> None:
        if where is not None:
            cond = F.expr(where) if isinstance(where, str) else where
            violated = cond & violated
        self._row_checks.append((table, name, violated))

    def not_null(self, table: str, col: str, where: str | None = None) -> None:
        """dbt ``not_null`` (conditional variants: reference
        _staging__models.yml:270-273,366-369)."""
        self._row(table, f"not_null: {col}" + (f" where {where}" if where else ""),
                  F.col(col).isNull(), where)

    def accepted_values(self, table: str, col: str, values: list, where: str | None = None) -> None:
        """dbt ``accepted_values`` — nulls never violate (dbt skips
        them; the not_null test owns null policy)."""
        self._row(table, f"accepted_values: {col}",
                  F.col(col).isNotNull() & ~F.col(col).isin(values), where)

    def expression_is_true(self, table: str, expression: str, name: str | None = None,
                           where: str | None = None) -> None:
        """dbt_utils.expression_is_true — nulls pass (SQL three-valued
        logic: only rows where the expression is *false* fail)."""
        self._row(table, name or f"expression: {expression}",
                  ~F.expr(expression) & F.expr(expression).isNotNull(), where)

    def match_regex(self, table: str, col: str, regex: str) -> None:
        """dbt_expectations.expect_column_values_to_match_regex."""
        self._row(table, f"match_regex: {col}",
                  F.col(col).isNotNull() & ~F.col(col).rlike(regex), None)

    def match_like(self, table: str, col: str, pattern: str) -> None:
        """dbt_expectations.expect_column_values_to_match_like_pattern."""
        self._row(table, f"match_like: {col}",
                  F.col(col).isNotNull() & ~F.col(col).like(pattern), None)

    # ------------------------------------------------------ key checks
    def unique(self, table: str, col: str, where: str | None = None) -> None:
        self.unique_combination(table, [col], where)

    def unique_combination(self, table: str, cols: list[str], where: str | None = None) -> None:
        """dbt ``unique`` / dbt_utils.unique_combination_of_columns:
        count of KEY GROUPS appearing more than once (null single-col
        keys exempt, as in dbt)."""
        name = f"unique: {', '.join(cols)}" + (f" where {where}" if where else "")

        def job() -> int:
            df = _where(self.tables[table], where)
            if len(cols) == 1:
                df = df.filter(F.col(cols[0]).isNotNull())
            return (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__n__"))
                .filter(F.col("__n__") > 1)
                .count()
            )

        self._job_checks.append((table, name, job))

    # ------------------------------------------------------ ref checks
    def relationships(self, table: str, col: str, to: str, field_: str) -> None:
        """dbt ``relationships``: every non-null child value exists in
        the parent (reference _staging__models.yml:114-116 etc.)."""
        name = f"relationships: {col} -> {to}.{field_}"

        def job() -> int:
            child = self.tables[table].select(F.col(col).alias("__v__")).filter(
                F.col("__v__").isNotNull()
            ).distinct()
            parent = self.tables[to].select(F.col(field_).alias("__v__"))
            # parent key sets here are dimension-sized; broadcast the
            # probe side at scale the anti-join shuffles on __v__
            return child.join(parent, "__v__", "left_anti").count()

        self._job_checks.append((table, name, job))

    # -------------------------------------------------- compare checks
    def equal_rowcount(self, table: str, compare: str) -> None:
        """dbt_utils.equal_rowcount (row conservation between
        models)."""
        name = f"equal_rowcount vs {compare}"

        def job() -> int:
            return abs(self.tables[table].count() - self.tables[compare].count())

        self._job_checks.append((table, name, job))

    def aggregate_match(self, table: str, key: str, agg_col: str, child_table: str,
                        child_key: str, child_expr: Column, name: str) -> None:
        """The custom generic tests duration_match / tracks_count_match
        (dbt/macros/tests/test_duration_match.sql:5-17,
        test_tracks_count_match.sql:5-17): an entity attribute must
        equal an aggregate over its child rows; failures are entities
        where they differ."""

        def job() -> int:
            children = (
                self.tables[child_table]
                .filter(F.col(child_key).isNotNull())
                .groupBy(F.col(child_key).alias(key))
                .agg(child_expr.alias("__agg__"))
            )
            return (
                self.tables[table]
                .join(children, key, "inner")
                .filter(F.col(agg_col) != F.col("__agg__"))
                .count()
            )

        self._job_checks.append((table, name, job))

    def custom(self, table: str, name: str, fn) -> None:
        """Singular tests (dbt/tests/no_lost_videos.sql): ``fn`` gets
        the tables dict and returns a failure count."""
        self._job_checks.append((table, name, lambda: fn(self.tables)))

    # ----------------------------------------------------- type checks
    def column_type(self, table: str, col: str, spark_type: str) -> None:
        """dbt_expectations.expect_column_values_to_be_of_type — a
        schema inspection, no job (BigQuery int64/float64/string map to
        bigint/double/string per SURVEY §1.2)."""
        schema = {f.name: f.dataType.simpleString() for f in self.tables[table].schema.fields}
        actual = schema.get(col, "<missing>")
        self._static.append(
            (table, f"column_type: {col} = {spark_type}", 0 if actual == spark_type else 1)
        )

    # ------------------------------------------------------------- run
    def run(self) -> list[CheckResult]:
        results = [CheckResult(t, n, f) for t, n, f in self._static]

        # fuse all row checks per table into one aggregate scan
        by_table: dict[str, list[tuple[str, Column]]] = {}
        for table, name, violated in self._row_checks:
            by_table.setdefault(table, []).append((name, violated))
        for table, checks in by_table.items():
            aggs = [
                F.sum(F.when(violated, 1).otherwise(0)).alias(f"c{i}")
                for i, (_, violated) in enumerate(checks)
            ]
            row = self.tables[table].agg(*aggs).collect()[0]
            for i, (name, _) in enumerate(checks):
                results.append(CheckResult(table, name, int(row[f"c{i}"] or 0)))

        for table, name, job in self._job_checks:
            results.append(CheckResult(table, name, int(job())))
        return results

    def count(self) -> int:
        return len(self._row_checks) + len(self._job_checks) + len(self._static)
