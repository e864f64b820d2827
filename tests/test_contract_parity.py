"""Driver-contract invariants that need no Spark session: every
queries() entry has an oracle_sql() twin and vice versa (the round-2
no_oracle gap must never reopen), and oracle SQL strings are non-empty.
"""

import __spark_entry__ as entry


def test_queries_and_oracles_in_lockstep():
    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))


def test_oracle_sql_nonempty_and_selects():
    for name, sql in entry.oracle_sql().items():
        assert sql and "SELECT" in sql.upper(), name
