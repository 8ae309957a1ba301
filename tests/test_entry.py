"""Driver-contract smoke: entry() + cheap queries() at sf0.001."""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

CHEAP = [
    "q01_pricing_summary", "q02_top_customers_per_nation",
    "q03_events_sessionize", "q04_token_explode", "q05_span_assembly",
    "q06_lemma_stats", "q07_doc_rating", "q08_top_docs_per_type",
    "q09_eval_tallies", "q12_simhash", "q14_lang_id", "q15_quality",
    "q16_token_counts", "q17_fingerprint", "q18_embedding_topk",
    "q20_events_hourly",
]


def test_oracle_keys_subset_of_queries():
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q
    assert len(o) >= 20


@pytest.mark.parametrize("name", CHEAP)
def test_query_runs_at_smoke_sf(spark, name):
    df = entry_mod.queries()[name](spark, SF_SMOKE)
    assert df.count() >= 0
    assert df.columns


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "subj_canonical" in df.columns
