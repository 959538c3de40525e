"""Property-based tests (SURVEY §5.4, hypothesis): name
canonicalization is total/idempotent/identifier-safe; normalize is
total over arbitrary column-name sets."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from poet_cloud_cost_etl_spark.operators.normalize import canonical_name
from poet_cloud_cost_etl_spark.diagnostics import path_to_table_name

NAME = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=1,
    max_size=40,
)


@given(NAME)
@settings(max_examples=300, deadline=None)
def test_canonical_name_is_identifier_safe(raw):
    out = canonical_name(raw)
    assert re.fullmatch(r"[a-z0-9_]*", out), (raw, out)
    assert not out or not out[0].isdigit()


@given(NAME)
@settings(max_examples=300, deadline=None)
def test_canonical_name_idempotent(raw):
    once = canonical_name(raw)
    assert canonical_name(once) == once


@given(st.lists(NAME, min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_path_to_table_name_total(segments):
    path = "/".join(segments)
    out = path_to_table_name(path)
    assert re.fullmatch(r"[a-z0-9_]+", out), (path, out)
