"""Date/time functions (SURVEY §2.7 F5-F6, §1.3 multi-format parsing).

The reference assembles PubDate from (Year, Month, Day) parts with
defaults ('1800','Jan','1') (main.py:363-377) and serializes ISO
(main.py:95-104); the ES mappings accept multiple date formats
(publication.json:922-929). All of that is expressible with built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def assemble_pub_date(year: Column, month: Column, day: Column) -> Column:
    """F5: dateutil.parse('Year Month Day') with reference defaults
    (main.py:365: ('1800','Jan','1')). Accepts month as name or number."""
    y = F.coalesce(year, F.lit("1800"))
    m = F.coalesce(month, F.lit("Jan"))
    d = F.coalesce(day, F.lit("1"))
    joined = F.concat_ws(" ", y, m, d)
    return F.coalesce(
        F.try_to_timestamp(joined, F.lit("yyyy MMM d")).cast("date"),
        F.try_to_timestamp(joined, F.lit("yyyy M d")).cast("date"),
        F.try_to_timestamp(joined, F.lit("yyyy MMMM d")).cast("date"),
    )


def iso_date(col: Column) -> Column:
    """F6: ISO yyyy-MM-dd serialization (main.py:95-104)."""
    return F.date_format(col, "yyyy-MM-dd")


def parse_multi_format(col: Column) -> Column:
    """ES `strict_date_optional_time||epoch_millis`-style leniency
    (publication.json:922-929): try several formats, first hit wins."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(col.cast("string"), F.lit("yyyy-MM-dd")),
    )
