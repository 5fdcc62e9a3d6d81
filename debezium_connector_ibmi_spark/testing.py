"""Reference-semantics oracle: a naive, single-threaded, ordered fold
of the changelog — what the reference connector's downstream consumer
would materialize (ExtractNewRecordState + upsert-by-key; replay
oracle modeled on JournalConcurrentUpdatesResetJournalsIT.java:67-99).

Deliberately uses none of the engine's Spark operators: plain Python
over collected rows, so engine bugs can't cancel out.
"""

from __future__ import annotations

import pandas as pd

from debezium_connector_ibmi_spark.functions.decode import extract_text_pd

_DATA_TYPES = {"PT": "c", "PX": "c", "UP": "u", "DL": "d", "DR": "d"}


def naive_replay(
    rows: list[dict],
    include_tables: tuple[str, ...] = ("PAGES",),
    delete_mode: str = "drop",
    initial_state: dict[str, dict] | None = None,
) -> dict[str, dict]:
    """Fold journal rows (any order) into final state keyed by url.

    ``initial_state``: snapshot rows ({url: {url, warc_ts, html,
    lang}}) the fold starts from (T10 handover oracle).
    """
    data = [
        r
        for r in rows
        if r["journal_code"] == "R"
        and r["entry_type"] in _DATA_TYPES
        and r["table_name"] in include_tables
    ]
    data.sort(key=lambda r: (r["receiver_idx"], r["seq"]))
    state: dict[str, dict] = {
        k: {**v, "__deleted": False} for k, v in (initial_state or {}).items()
    }
    for r in data:
        op = _DATA_TYPES[r["entry_type"]]
        if op == "d":
            if delete_mode == "drop":
                state.pop(r["url"], None)
            else:
                prev = state.get(r["url"], {})
                state[r["url"]] = {**prev, "__deleted": True}
        else:
            state[r["url"]] = {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "html": bytes(r["html"]) if r["html"] is not None else None,
                "lang": r["lang"],
                "__deleted": False,
            }
    htmls = pd.Series([v.get("html") for v in state.values()], dtype="object")
    texts = extract_text_pd(htmls)
    for (k, v), t in zip(state.items(), texts):
        v["text"] = t if t is not None else None
    return state


def state_df_to_dict(df) -> dict[str, dict]:
    """Engine state DataFrame -> same dict shape as naive_replay."""
    out = {}
    for r in df.collect():
        d = r.asDict()
        if d.get("html") is not None:
            d["html"] = bytes(d["html"])
        out[d["url"]] = d
    return out
