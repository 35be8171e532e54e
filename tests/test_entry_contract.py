"""Driver-contract smoke tests: entry(), queries()/oracle_sql()
consistency. The full Spark-vs-DuckDB value comparison lives in
scripts/check_oracles.py (run separately — it needs a DuckDB session
per table set)."""

import os

import pytest

import __spark_entry__ as entrymod


class TestContractShape:
    def test_oracle_keys_subset_of_queries(self):
        q, o = entrymod.queries(), entrymod.oracle_sql()
        assert set(o) <= set(q)
        missing_oracle = set(q) - set(o)
        # permanent contract: EVERY driver query ships with a DuckDB
        # oracle (round 3 closed the last rows-only query,
        # kg_triples_full, with a recursive-CTE greedy-flatten oracle)
        assert missing_oracle == set()

    def test_queries_are_callables(self):
        assert all(callable(f) for f in entrymod.queries().values())

    def test_oracle_sql_are_strings(self):
        assert all(isinstance(s, str) and "SELECT" in s.upper()
                   for s in entrymod.oracle_sql().values())


class TestEntrySmoke:
    def test_entry_returns_triples(self, spark):
        df = entrymod.entry(spark)
        assert [f.name for f in df.schema.fields] == [
            "subj", "pred", "obj", "url", "warc_ts", "prob",
        ]
        assert df.count() > 0

    @pytest.mark.parametrize("name", ["ner_mentions", "token_counts", "q1_pricing"])
    def test_representative_queries_run_at_sf0001(self, spark, name):
        df = entrymod.queries()[name](spark, "/root/testdata/sf0.001")
        assert df.count() >= 0
