#!/usr/bin/env python3
"""Independent JSONL fixture writer (python-stdlib only, like the other
fixture generators): a documents-corpus file exercising the decode edge
cases a real LLM-corpus JSONL carries — unicode (CJK/emoji/accents),
escaped quotes and newlines inside strings, missing fields, explicit
nulls, scientific-notation doubles, negative/large ints, empty and null
arrays, nested metadata objects. Deterministic output (no RNG).

Also writes a corrupt twin (truncated JSON, bare text, wrong-type rows)
for the PERMISSIVE corrupt-record unit spec.

Usage: python3 tools/make_jsonl_fixture.py <outDir>
"""
import json
import sys


def rows():
    langs = ["en", "de", "fr", "es", "ja"]
    for i in range(60):
        r = {
            "doc_id": i + 1,
            "lang": langs[i % 5],
            "text": f"doc {i + 1} body with tokens t{i} t{i + 1}",
            "score": round(0.1 + (i % 10) * 0.07, 4),
            "tags": [f"tag{i % 3}", f"tag{i % 7}"],
            "meta": {"source": f"src{i % 4}", "ts": 1700000000 + i * 3600},
        }
        yield i, r


def main(out_dir: str) -> None:
    recs = []
    for i, r in rows():
        if i == 7:
            r["text"] = 'quote " backslash \\ and\nnewline inside'
        if i == 11:
            r["text"] = "unicode: Café 東京 🚀 straße ĐÔNG"
        if i == 13:
            del r["tags"]            # missing field -> null
        if i == 17:
            r["tags"] = []           # empty array
        if i == 19:
            r["score"] = None        # explicit null
        if i == 23:
            r["score"] = 1.5e-5      # scientific notation
        if i == 29:
            r["meta"]["ts"] = -86400  # pre-epoch
        if i == 31:
            del r["meta"]            # missing nested object
        if i == 37:
            r["doc_id"] = 9007199254740993  # > 2^53 (BIGINT exactness)
        recs.append(json.dumps(r, ensure_ascii=False))
    with open(f"{out_dir}/docs_corpus.jsonl", "w", encoding="utf-8") as f:
        f.write("\n".join(recs) + "\n")

    corrupt = [
        json.dumps({"doc_id": 1, "lang": "en", "text": "good row"}),
        '{"doc_id": 2, "lang": "en", "text": "truncated',
        "not json at all",
        json.dumps({"doc_id": "NaN-ish", "lang": "en", "text": "wrong type"}),
        json.dumps({"doc_id": 5, "lang": "de", "text": "good again"}),
    ]
    with open(f"{out_dir}/docs_corrupt.jsonl", "w", encoding="utf-8") as f:
        f.write("\n".join(corrupt) + "\n")
    print(f"wrote {len(recs)} rows + {len(corrupt)} corrupt-twin rows")


if __name__ == "__main__":
    main(sys.argv[1])
