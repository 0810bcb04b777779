"""Date/time scalar helpers mirroring the reference's inline date logic
(SURVEY.md §2.1 O17-O19)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def filename_business_date(source_file: Column | str) -> Column:
    """Business date from an R520 daily filename.

    The reference slices chars 5:13 of `R520.YYYYMMDD...` and parses
    %Y%m%d (/root/reference/main.py:358-368). Same char positions here
    (1-based substring(6, 8)); malformed names yield NULL (try-parse).
    """
    c = F.col(source_file) if isinstance(source_file, str) else source_file
    return F.try_to_timestamp(F.substring(c, 6, 8), F.lit("yyyyMMdd")).cast("date")


def archive_path(source_file: Column | str, prefix: str = "Daily") -> Column:
    """Backup layout `Daily/YYYY/YYYYMMDD/<name>` (main.py:360-368)."""
    c = F.col(source_file) if isinstance(source_file, str) else source_file
    d = filename_business_date(c)
    return F.concat_ws(
        "/",
        F.lit(prefix),
        F.date_format(d, "yyyy"),
        F.date_format(d, "yyyyMMdd"),
        c,
    )


def target_business_date(now: Column | str | None = None) -> Column:
    """The reference's "today": utcnow + 5h30m, i.e. IST civil date
    (main.py:444). ``now`` parameterizes the clock (a UTC timestamp
    column) so the logic is oracle-testable on pinned timestamps
    (q145); None keeps the reference's wall-clock behavior."""
    c = (
        F.current_timestamp()
        if now is None
        else (F.col(now) if isinstance(now, str) else now)
    )
    return F.to_date(F.from_utc_timestamp(c, "Asia/Kolkata"))


def jst_timestamp(ts: Column | str = None) -> Column:
    """UTC -> Asia/Tokyo conversion for report timestamps
    (email_sender.py:43-45)."""
    c = F.current_timestamp() if ts is None else (
        F.col(ts) if isinstance(ts, str) else ts
    )
    return F.from_utc_timestamp(c, "Asia/Tokyo")
