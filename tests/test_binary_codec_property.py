"""Property test: the binary codec's pure core round-trips ARBITRARY cells
(random strings incl. unicode/empty, random set/null/deletion combinations,
random timestamps) — no Spark in the loop, so hypothesis can hammer it."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from debezium_connector_cassandra_spark.functions.binary_codec import (
    _decode_batch,
    _encode_cells_py,
)

_text = st.one_of(
    st.none(),
    st.text(max_size=40),
    st.text(alphabet="☃é漢🎉\x00ab ", max_size=20),
)
_del_ts = st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62))
_micros = st.integers(min_value=0, max_value=4_000_000_000_000_000)  # ~ year 2096


def _cell(value_strategy):
    return st.fixed_dictionaries(
        {
            "value": value_strategy,
            "deletion_ts": _del_ts,
            "set": st.booleans(),
        }
    )


_cells = st.fixed_dictionaries(
    {
        "role": _cell(_text),
        "text": _cell(_text),
        "tool": _cell(_text),
        "ts": _cell(
            st.one_of(st.none(), _micros.map(lambda u: pd.Timestamp(u * 1000)))
        ),
    }
)


def _norm(cells):
    """The decode-visible form: unset cells lose their value; values of set
    cells stringify (the codec stores strings); dels survive regardless."""
    out = {}
    for name, c in cells.items():
        v = c["value"] if c["set"] else None
        if v is not None and name != "ts":
            v = str(v)
        out[name] = {"value": v, "deletion_ts": c["deletion_ts"], "set": c["set"]}
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.one_of(st.none(), _cells), min_size=1, max_size=8))
def test_roundtrip_arbitrary_cells(rows):
    payloads = pd.Series(
        [None if r is None else _encode_cells_py(r) for r in rows], dtype=object
    )
    dec = _decode_batch(payloads)
    for i, r in enumerate(rows):
        if r is None:
            for name in ("role", "text", "tool", "ts"):
                assert dec[f"_{name}_set"][i] == False  # noqa: E712
                assert dec[f"_{name}_value"][i] is None or dec[f"_{name}_value"][i] is pd.NaT
                assert dec[f"_{name}_del"][i] is None
            continue
        want = _norm(r)
        for name in ("role", "text", "tool", "ts"):
            w = want[name]
            assert bool(dec[f"_{name}_set"][i]) == w["set"], (i, name)
            assert dec[f"_{name}_del"][i] == w["deletion_ts"], (i, name)
            got_v = dec[f"_{name}_value"][i]
            if name == "ts":
                if w["value"] is None:
                    assert got_v is pd.NaT or pd.isna(got_v)
                else:
                    assert pd.Timestamp(got_v) == w["value"], (i, name)
            else:
                assert got_v == w["value"], (i, name)
