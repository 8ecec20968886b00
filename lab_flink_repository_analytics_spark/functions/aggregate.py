"""Aggregate function library (ref: sql-functions UDAFs, SURVEY.md §2.D).

The reference's UDAFs are arrival-order dependent (stream order).  Batch
Spark has no arrival order, so — per SURVEY.md §7 hard-part 2 — every
order-sensitive aggregate here takes an **explicit ordering column**
(usually the event time) and is deterministic.  All of them are pure
Column expressions over Spark's native aggregates (``collect_list``,
``max_by`` + higher-order array functions), so they keep Catalyst's
partial/final aggregation and codegen — no ``applyInPandas`` in this module.

Scale note: the collect-based aggregates materialize one group's values in
memory, same as the reference's ListView/MapView accumulators; they are
meant for per-entity groups (per person, per thread), not whole-table
groups.  ``last_*``/``largest_*`` use ``max_by`` which is O(1) state and
safe for any group size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def array_list_agg(
    value: Column | str,
    order_by: Column | str | None = None,
    distinct: bool = True,
) -> Column:
    """Collect (optionally DISTINCT) non-null values into an array.

    ref ArrayListAggFunction[2-4].java — insertion-order collect; the
    type-polymorphism of variants 3/4 is free in Spark (``collect_list`` is
    generic).  With ``order_by``, order = first occurrence in event-time
    order (deterministic batch equivalent of arrival order); without, the
    collection order is partition-dependent like the reference's.
    """
    v = _c(value)
    if order_by is None:
        collected = F.collect_list(v)
        return F.array_distinct(collected) if distinct else collected
    pairs = F.array_sort(
        F.collect_list(F.when(v.isNotNull(), F.struct(_c(order_by).alias("o"), v.alias("v"))))
    )
    values = F.transform(pairs, lambda s: s["v"])
    return F.array_distinct(values) if distinct else values


def list_agg(
    value: Column | str,
    order_by: Column | str | None = None,
    distinct: bool = True,
    sep: str = ",",
) -> Column:
    """``LISTAGG(DISTINCT x)`` — comma-joined collect.

    ref ListAggITCase112.java:66 / ListAggITCase113.java:51 (the reference
    uses ArrayListAggFunction + a join; final state asserted).
    """
    return F.array_join(array_list_agg(value, order_by, distinct), sep)


def last_non_null_value_agg(value: Column | str, order_by: Column | str) -> Column:
    """Latest non-null value per group, by explicit event-time order.

    ref LastNonNullValueAggFunction.java:21-83 — nulls neither update nor
    reset the state (fixture: ``null,1,2,null`` → ``2``).  ``max_by`` over
    an order key that is NULL for null values keeps exactly those rows out
    of the running.
    """
    v = _c(value)
    return F.max_by(v, F.when(v.isNotNull(), _c(order_by)))


def last_value_array_agg(value: Column | str, order_by: Column | str) -> Column:
    """Last non-null ARRAY value seen (ref LastValueStringArrayAggFunction
    .java:12-39; fixture ``[a],[a,b],[c],[a,b,d]`` → ``[a,b,d]``)."""
    return last_non_null_value_agg(value, order_by)


def largest_array_agg(value: Column | str, order_by: Column | str) -> Column:
    """Array with the largest cardinality seen in the group.

    ref LargestStringArrayAggFunction.java:12-39 — strictly-greater
    replaces, so on ties the *earliest* array wins.  Implemented as
    ``max_by`` over ``(size, -order)``: max size first, then the earliest
    occurrence.  ``order_by`` must be numeric or timestamp (negated via
    epoch micros).
    """
    v = _c(value)
    o = _c(order_by)
    neg = -o.cast("double")
    key = F.when(
        v.isNotNull(), F.struct(F.size(v).alias("n"), neg.alias("o"))
    )
    return F.max_by(v, key)


#: Domains never interpreted as companies (freemail / foundations), matched
#: case-insensitively — ref GetEmailAliasesAndCompany.java:42-73.
COMPANY_EXCLUDES = [
    "126.com",
    "163.com",
    "apache.org",
    "gmail.com",
    "gmx.de",
    "gmx.net",
    "gmx.org",
    "googlemail.com",
    "hotmail.com",
    "hotmail.de",
    "hotmail.it",
    "icloud.com",
    "live.com",
    "live.it",
    "mail.ru",
    "mailbox.org",
    "msn.com",
    "outlook.com",
    "outlook.de",
    "pobox.com",
    "posteo.de",
    "users.noreply.github.com",
    "web.de",
    "yahoo.com",
    "yahoo.in",
    "qq.com",
]

#: Historic Ververica domains rewritten on output —
#: ref GetEmailAliasesAndCompany.java:75-76 (note: the reference's pattern
#: leaves the dot unescaped; replicated verbatim for parity).
VERVERICA_ALIASES_PATTERN = r"(data-artisans|da-platform).com"


def _email_domain(email: Column) -> Column:
    """Domain after the *last* '@', NULL when absent/empty (ref :102-104)."""
    dom = F.substring_index(email, "@", -1)
    return F.when(email.contains("@") & (dom != ""), dom)


def get_email_aliases_and_company(
    email: Column | str, ts: Column | str
) -> Column:
    """Composite person-profile aggregate.

    Returns ``STRUCT<aliases ARRAY<STRING>, company STRING,
    companySince TIMESTAMP>`` per group:

    * ``aliases`` — distinct emails, first-occurrence order by event time
      (ref: MapView key set, :79-97; order made explicit for batch).
    * ``company`` — domain of the most recent email whose domain is not in
      :data:`COMPANY_EXCLUDES` (case-insensitive, :105-106); historic
      ``data-artisans.com``/``da-platform.com`` rewritten to
      ``ververica.com`` on output only (:114-117).
    * ``companySince`` — timestamp of the event that *changed* the company
      to its current value; consecutive repeats of the same domain don't
      refresh it, an excluded-domain email in between doesn't interrupt a
      run, but an intervening different company resets it (:100-108;
      fixture: test.com@t1 … test2.com@t4, test.com@t5 → since t5).

    Pure expression: sort the group's (ts, email) pairs, then a linear
    ``F.aggregate`` fold replicates the reference's accumulate() scan —
    all JVM-side, no Python.  Event-time ties break by email (batch
    determinism; the reference inherits arrival order instead).
    """
    e, t = _c(email), _c(ts)
    rows = F.array_sort(
        F.collect_list(
            F.when(e.isNotNull(), F.struct(t.alias("ts"), e.alias("email")))
        )
    )
    aliases = F.array_distinct(F.transform(rows, lambda r: r["email"]))

    excludes = F.array(*[F.lit(d) for d in COMPANY_EXCLUDES])

    def step(acc: Column, r: Column) -> Column:
        dom = _email_domain(r["email"])
        changes = (
            dom.isNotNull()
            & ~F.array_contains(excludes, F.lower(dom))
            & ~dom.eqNullSafe(acc["company"])
        )
        return F.struct(
            F.when(changes, dom).otherwise(acc["company"]).alias("company"),
            F.when(changes, r["ts"]).otherwise(acc["since"]).alias("since"),
        )

    init = F.struct(
        F.lit(None).cast("string").alias("company"),
        F.lit(None).cast("timestamp").alias("since"),
    )
    folded = F.aggregate(rows, init, step)
    company = F.regexp_replace(
        folded["company"], VERVERICA_ALIASES_PATTERN, "ververica.com"
    )
    return F.struct(
        aliases.alias("aliases"),
        company.alias("company"),
        folded["since"].alias("companySince"),
    )


def email_profiles_df(
    df,
    person: str = "person",
    email: str = "email",
    ts: str = "ts",
):
    """Table-scale twin of :func:`get_email_aliases_and_company`.

    The expression form folds each group's rows with ``F.aggregate``, which
    Spark interprets per element — fine for small groups, a Python-free but
    interpreter-bound scan at 100 TB.  This variant keeps the identical
    semantics fully inside codegen/window execution via the change-point
    formulation: a row *changes* the company iff its domain is valid
    (non-null, not excluded) and differs from the previous VALID row's
    domain (which always equals the accumulator's company at that point in
    the fold, ref GetEmailAliasesAndCompany.java:100-108); the final
    (company, companySince) is then the (domain, ts) of the LAST change
    row — one window pass + one aggregation, and the aggregation reuses
    the window's hash partitioning (no second exchange).

    Returns one row per person: (person, aliases, company, companySince).
    """
    from pyspark.sql import Window

    e, t = F.col(email), F.col(ts)
    dom = _email_domain(e)
    excludes = F.array(*[F.lit(d) for d in COMPANY_EXCLUDES])
    valid = dom.isNotNull() & ~F.array_contains(excludes, F.lower(dom))

    w = (
        Window.partitionBy(person)
        .orderBy(t, e)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_valid_dom = F.last(F.when(valid, dom), ignorenulls=True).over(w)
    is_change = valid & ~dom.eqNullSafe(prev_valid_dom)

    key = F.struct(t.alias("ts"), e.alias("email"))
    enriched = df.withColumn("__dom", dom).withColumn("__chg", is_change)
    rows = F.array_sort(
        F.collect_list(F.when(e.isNotNull(), F.struct(t.alias("ts"), e.alias("email"))))
    )
    out = enriched.groupBy(person).agg(
        F.array_distinct(F.transform(rows, lambda r: r["email"])).alias("aliases"),
        F.max_by(F.col("__dom"), F.when(F.col("__chg"), key)).alias("__c"),
        F.max(F.when(F.col("__chg"), t)).alias("companySince"),
    )
    return out.select(
        person,
        "aliases",
        F.regexp_replace(
            F.col("__c"), VERVERICA_ALIASES_PATTERN, "ververica.com"
        ).alias("company"),
        "companySince",
    )
