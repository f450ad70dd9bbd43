"""Engine constants.

The reference computes every date window from wall-clock ``datetime.now()``
(SURVEY.md Q8: analyze_insta_enhanced.py:80,1122,1282,1502,1558). That makes
results non-reproducible, so this engine threads a pinned ``as_of`` timestamp
through every windowed operator. The defaults below are chosen to land inside
the driver testdata's date ranges.
"""

from __future__ import annotations

import datetime as dt

# orders.o_orderdate / lineitem.l_shipdate span 1995-01-01 .. 2001-11-04.
AS_OF_ORDERS = dt.datetime(2001, 6, 1)
AS_OF_ORDERS_SQL = "TIMESTAMP '2001-06-01 00:00:00'"

# events.ts spans 2024-01-01 .. 2024-01-30.
AS_OF_EVENTS = dt.datetime(2024, 1, 31)
AS_OF_EVENTS_SQL = "TIMESTAMP '2024-01-31 00:00:00'"

# Reference-shaped fixtures pin the golden-run date (SURVEY.md §5).
AS_OF_REFERENCE = dt.datetime(2025, 9, 7)

DAY_SECONDS = 86400

# Reference window lengths (analyze_insta_enhanced.py:1502 (90d), :1282 (300d),
# :269 (first-20 slice)).
RECENT_DAYS = 90
COLLAB_RECENT_DAYS = 300
FAKE_FOLLOWER_SLICE = 20

# Engagement-rate comment weights — the reference has three coexisting
# formulas (SURVEY.md Q5): A1 'engagement score' 2×, A2 'interaction score'
# 5× (the headline sort key), A3 plain 1×.
ER_COMMENT_WEIGHT_ENGAGEMENT = 2
ER_COMMENT_WEIGHT_INTERACTION = 5
ER_COMMENT_WEIGHT_PLAIN = 1
