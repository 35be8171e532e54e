"""Driver-side HTML inspection report (S8).

The reference renders gold/pred entities as an HTML table for manual
inspection (gen_html, /root/reference/datautils.py:2439-2527). Here:
collect a LIMITED sample (never the full table) and render mentions
highlighted inside their document text.
"""

from __future__ import annotations

import html as html_mod

from pyspark.sql import DataFrame

_CSS = """
body { font-family: sans-serif; max-width: 70em; margin: 2em auto; }
mark { padding: 0 .15em; border-radius: .2em; }
.mtype { font-size: .7em; vertical-align: super; color: #555; }
table { border-collapse: collapse; } td, th { border: 1px solid #ccc; padding: .3em .6em; }
"""

_PALETTE = ["#ffe08a", "#b5e8b0", "#aad4ff", "#f4b8d0", "#d8c6ff", "#ffd3b0"]


def render_mentions_html(docs: DataFrame, mentions: DataFrame, key_col: str = "url",
                         text_col: str = "text", limit: int = 50) -> str:
    """Highlight token-span mentions in whitespace-tokenized text."""
    sample = {r[key_col]: r[text_col] for r in docs.select(key_col, text_col).limit(limit).collect()}
    keys = list(sample)
    ms = mentions.where(mentions["doc_key"].isin(keys) if "doc_key" in mentions.columns
                        else mentions[key_col].isin(keys)).collect()
    key_field = "doc_key" if ms and "doc_key" in ms[0].__fields__ else key_col
    by_doc: dict[str, list] = {}
    for r in ms:
        by_doc.setdefault(r[key_field], []).append(r)
    types = sorted({r["ent_type"] for r in ms})
    color = {t: _PALETTE[i % len(_PALETTE)] for i, t in enumerate(types)}

    rows = []
    for key in keys:
        tokens = sample[key].split(" ")
        spans = sorted(by_doc.get(key, []), key=lambda r: (r["start"], -r["end"]))
        out, i = [], 0
        for s in spans:
            if s["start"] < i:
                continue  # overlapping (nested) mention: outermost wins for display
            out += [html_mod.escape(t) for t in tokens[i : s["start"]]]
            body = html_mod.escape(" ".join(tokens[s["start"] : s["end"]]))
            out.append(
                f'<mark style="background:{color[s["ent_type"]]}">{body}'
                f'<span class="mtype">{html_mod.escape(s["ent_type"])}</span></mark>'
            )
            i = s["end"]
        out += [html_mod.escape(t) for t in tokens[i:]]
        rows.append(f"<tr><td>{html_mod.escape(str(key))}</td><td>{' '.join(out)}</td></tr>")

    legend = " ".join(
        f'<mark style="background:{c}">{html_mod.escape(t)}</mark>' for t, c in color.items()
    )
    return (
        f"<!doctype html><html><head><meta charset='utf-8'><style>{_CSS}</style></head>"
        f"<body><h1>Mention sample ({len(keys)} docs)</h1><p>{legend}</p>"
        f"<table><tr><th>doc</th><th>text</th></tr>{''.join(rows)}</table></body></html>"
    )


def write_mentions_html(path: str, docs: DataFrame, mentions: DataFrame, **kw) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write(render_mentions_html(docs, mentions, **kw))
