"""Shared date/param helpers — the engine's analog of the reference's
``common/Utils.java``.

``parse_flexible_date`` mirrors ``Utils.parseFlexibleDate``
(common/Utils.java:21-46): a ``DateTimeFormatterBuilder`` accepting
``yyyy-MM[-dd[THH:mm[:ss[.SSS...]]Z]]`` case-insensitively, with
``parseDefaulting(DAY_OF_MONTH, 1)`` and ``parseDefaulting(HOUR_OF_DAY, 0)``
(so minute/second/fraction resolve to 0), and null/empty → "now".  The
reference feeds it CLI params like ``--start-date 2021-04``
(FlinkCommitProgram.java:51, GithubCommitSource since-parsing); our ingest
sources accept the same forms for ``since``/``until``/``after``.

All values are UTC-naive (the reference evaluates in
``EVALUATION_ZONE = UTC``, Utils.java:19).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

#: yyyy-MM[-dd[T HH:mm[:ss[.frac]] Z]] — 'T'/'Z' case-insensitive, year may
#: exceed 4 digits (SignStyle.EXCEEDS_PAD), seconds/fraction optional per
#: ISO_LOCAL_TIME.  Two lenient extensions over the reference formatter —
#: a bare "yyyy" and an omitted trailing 'Z' — only widen the accepted CLI
#: surface; every reference-accepted input parses identically.
_FLEX = re.compile(
    r"""^(?P<y>\d{4,10})
        (?:-(?P<m>\d{2})
           (?:-(?P<d>\d{2})
              (?:[Tt]
                 (?P<hh>\d{2}):(?P<mi>\d{2})
                 (?::(?P<ss>\d{2})(?:\.(?P<f>\d{1,9}))?)?
                 [Zz]?
              )?
           )?
        )?$""",
    re.VERBOSE,
)


def parse_flexible_date(s: str | None, now: datetime | None = None) -> datetime:
    """``Utils.parseFlexibleDate`` (common/Utils.java:40-46).

    >>> parse_flexible_date("2021-04")
    datetime.datetime(2021, 4, 1, 0, 0)
    >>> parse_flexible_date("2021-04-15")
    datetime.datetime(2021, 4, 15, 0, 0)
    >>> parse_flexible_date("2021-04-15T12:30:05Z")
    datetime.datetime(2021, 4, 15, 12, 30, 5)

    Empty/None returns ``now`` (UTC-naive), matching the reference's
    ``LocalDateTime.now()`` branch; pass ``now`` explicitly for
    deterministic tests.  Unparseable input raises ``ValueError`` like the
    reference's ``DateTimeParseException``.
    """
    if not s:
        return now if now is not None else datetime.now(timezone.utc).replace(
            tzinfo=None
        )
    m = _FLEX.match(s.strip())
    if not m:
        # compatibility fallback: the ingest DataSources accepted any
        # datetime.fromisoformat form before the reference-parity parser
        # landed (space-separated 'YYYY-MM-DD HH:MM:SS', explicit offsets
        # like '+00:00').  Keep accepting those — offset-aware values are
        # converted to UTC then made naive, matching EVALUATION_ZONE=UTC.
        try:
            dt = datetime.fromisoformat(s.strip())
        except ValueError:
            raise ValueError(f"cannot parse flexible date: {s!r}") from None
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    g = m.groupdict()
    frac = g["f"] or ""
    micros = int((frac + "000000")[:6]) if frac else 0
    return datetime(
        int(g["y"]),
        int(g["m"] or 1),
        int(g["d"] or 1),
        int(g["hh"] or 0),
        int(g["mi"] or 0),
        int(g["ss"] or 0),
        micros,
    )
