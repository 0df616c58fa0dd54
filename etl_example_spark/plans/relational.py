"""Extended relational surface — filled in beyond reference parity.

The reference has none of these (SURVEY §2.8 lists the absent categories);
they are stock Catalyst constructs that complete the engine's SQL surface:
windows, set ops, semi/anti/outer joins, distinct and approximate
aggregates, rollup/cube, HAVING, CTEs/subqueries, JSON extraction.
"""

from __future__ import annotations
