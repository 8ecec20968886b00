"""Custom stateful streaming operators (``applyInPandasWithState``).

The one reference operator whose semantics are a keyed state machine rather
than a windowed aggregate — ``GetEmailAliasesAndCompany``
(sql-functions/src/main/java/com/ververica/platform/sql/functions/
GetEmailAliasesAndCompany.java:38-123) — maintained *incrementally* here:
per-person state (alias set, current company domain, company-since) lives
in the streaming state store and is updated per micro-batch, mirroring the
reference's accumulator exactly (the batch twin is
``functions.aggregate.get_email_aliases_and_company``).

Scale notes: state is partitioned by key across executors (RocksDB state
store provider at scale); each micro-batch touches only the keys present in
the batch; output mode ``update`` emits refreshed profiles only.  Ordering:
rows *within* a batch are folded in event-time order; across batches,
arrival order governs — which is precisely the reference's semantics (its
accumulator sees Kafka arrival order).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from lab_flink_repository_analytics_spark.functions.aggregate import (
    COMPANY_EXCLUDES,
    VERVERICA_ALIASES_PATTERN,
)

PROFILE_SCHEMA = (
    "person string, aliases array<string>, company string, companySince timestamp"
)
_STATE_SCHEMA = "aliases array<string>, company string, since timestamp"
_EXCLUDES = frozenset(COMPANY_EXCLUDES)


def _domain(email: str) -> str | None:
    """Domain after the last '@', None when absent/empty (ref :102-104)."""
    if email is None or "@" not in email:
        return None
    dom = email.rsplit("@", 1)[-1]
    return dom or None


def _update_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        aliases, company, since = state.get
        aliases = list(aliases)
    else:
        aliases, company, since = [], None, None

    batch = pd.concat(list(pdfs))
    # event-time order within the batch (ties by email for determinism)
    batch = batch.sort_values(["ts", "email"])
    for email, ts in zip(batch["email"], batch["ts"]):
        if email is None or (isinstance(email, float) and pd.isna(email)):
            continue
        if email not in aliases:
            aliases.append(email)
        dom = _domain(email)
        # same accumulate() rule as the batch fold: a non-excluded domain
        # that differs from the current company changes it and stamps since
        if dom is not None and dom.lower() not in _EXCLUDES and dom != company:
            company = dom
            since = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts

    state.update((aliases, company, since))
    shown = (
        re.sub(VERVERICA_ALIASES_PATTERN, "ververica.com", company)
        if company is not None
        else None
    )
    yield pd.DataFrame(
        [
            {
                "person": key[0],
                "aliases": aliases,
                "company": shown,
                "companySince": since,
            }
        ]
    )


def email_profiles_stream(emails: DataFrame) -> DataFrame:
    """Incremental per-person profile stream.

    ``emails`` needs columns ``person`` (group key), ``email``, ``ts``.
    Returns an update stream of ``PROFILE_SCHEMA`` rows — one refreshed
    profile per person per micro-batch that touched them.
    """
    return (
        emails.select("person", "email", "ts")
        .groupBy("person")
        .applyInPandasWithState(
            _update_profile,
            PROFILE_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def exact_dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    fingerprint_col: str = "fp",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: first doc per content fingerprint survives.

    Built on ``dropDuplicatesWithinWatermark`` so the fingerprint state is
    garbage-collected once the watermark passes — bounded state at 100 TB
    stream scale, unlike an unbounded ``dropDuplicates``.
    """
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [fingerprint_col]
    )
