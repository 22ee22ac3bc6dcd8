#!/usr/bin/env python
"""Body-text recall/precision eval: naive vs density HTML extraction
(VERDICT r6 next-round item #3 — the eval that gates flipping E6's
default extractor).

Builds deterministic page fixtures where the BODY tokens and the
BOILERPLATE tokens are known by construction (nav bars, footers,
sidebars, related-link lists, cookie banners around generated body
paragraphs), runs both extractors (sources/warc.html_text /
html_text_density), and scores token-level:

* recall    = |extracted ∩ body| / |body|        (body kept)
* precision = |extracted ∩ body| / |extracted|   (boilerplate kept out)

over a template mix that includes the density classifier's honest
hard cases (short-paragraph bodies, link-farm pages with no body,
bodies with inline links). Writes EXTRACTOR_EVAL.json; the judgement
rule for the default flip: density must win on F1 aggregate and not
catastrophically lose recall on any single template class.

Usage: python tools/extractor_eval.py [--out EXTRACTOR_EVAL.json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def words(seed: str, n: int) -> str:
    """n deterministic pseudo-words (pure function of seed)."""
    import hashlib

    out = []
    for i in range(n):
        h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
        out.append("w" + h[:6])
    return " ".join(out)


NAV = '<nav><a href="/">Home</a> <a href="/about">About us</a> <a href="/contact">Contact</a> <a href="/pricing">Pricing</a></nav>'
FOOTER = '<footer><a href="/privacy">Privacy policy</a> <a href="/terms">Terms of service</a> <a href="/imprint">Imprint</a> Copyright 2026 Example Corp</footer>'
COOKIE = '<div class="cookie">We use cookies <a href="/cookies">Learn more</a> <a href="#">Accept all</a> <a href="#">Reject</a></div>'


def sidebar(seed: str) -> str:
    links = " ".join(
        f'<li><a href="/p/{i}">{words(seed + "sb" + str(i), 3)}</a></li>'
        for i in range(8)
    )
    return f"<aside><ul>{links}</ul></aside>"


def related(seed: str) -> str:
    links = " ".join(
        f'<li><a href="/r/{i}">{words(seed + "rel" + str(i), 4)}</a></li>'
        for i in range(6)
    )
    return f"<div><h3>Related articles</h3><ul>{links}</ul></div>"


def templates(seed: str) -> list[tuple[str, str, str]]:
    """(template_name, html, body_text) fixtures."""
    out = []
    # 1. article: 3 long paragraphs, nav + footer
    body = [words(f"{seed}a{p}", 60) for p in range(3)]
    html = (
        f"<html><body>{NAV}"
        + "".join(f"<p>{b}</p>" for b in body)
        + f"{FOOTER}</body></html>"
    )
    out.append(("article_nav_footer", html, " ".join(body)))
    # 2. blog with link sidebar
    body = [words(f"{seed}b{p}", 45) for p in range(2)]
    html = (
        f"<html><body>{NAV}{sidebar(seed)}"
        + "".join(f"<p>{b}</p>" for b in body)
        + f"{FOOTER}</body></html>"
    )
    out.append(("blog_sidebar", html, " ".join(body)))
    # 3. cookie banner + long body
    body = [words(f"{seed}c{p}", 80) for p in range(2)]
    html = (
        f"<html><body>{COOKIE}"
        + "".join(f"<p>{b}</p>" for b in body)
        + f"{FOOTER}</body></html>"
    )
    out.append(("cookie_longbody", html, " ".join(body)))
    # 4. HARD: short-paragraph body (8-12 words each) — density's
    # word-count arms can drop these
    body = [words(f"{seed}d{p}", 8 + p) for p in range(5)]
    html = (
        f"<html><body>{NAV}"
        + "".join(f"<p>{b}</p>" for b in body)
        + f"{FOOTER}</body></html>"
    )
    out.append(("short_paragraphs", html, " ".join(body)))
    # 5. news with related-links block mid-page
    b1, b2 = words(f"{seed}e1", 70), words(f"{seed}e2", 55)
    html = (
        f"<html><body>{NAV}<p>{b1}</p>{related(seed)}<p>{b2}</p>"
        f"{FOOTER}</body></html>"
    )
    out.append(("news_related", html, b1 + " " + b2))
    # 6. minimal: body only
    body = words(f"{seed}f", 40)
    out.append(("minimal", f"<html><body><p>{body}</p></body></html>", body))
    # 7. PRECISION: link farm, no body at all
    links = " ".join(
        f'<li><a href="/l/{i}">{words(seed + "lf" + str(i), 3)}</a></li>'
        for i in range(20)
    )
    out.append(("link_farm", f"<html><body>{NAV}<ul>{links}</ul>{FOOTER}</body></html>", ""))
    # 8. body with inline links (~20% of body words inside <a>)
    segs = []
    body_words = []
    for p in range(3):
        w = words(f"{seed}g{p}", 40)
        a = words(f"{seed}ga{p}", 8)
        segs.append(f"<p>{w} <a href='/x{p}'>{a}</a></p>")
        body_words.append(w + " " + a)
    html = f"<html><body>{NAV}{''.join(segs)}{FOOTER}</body></html>"
    out.append(("inline_links", html, " ".join(body_words)))
    return out


def score(extracted: str, body: str) -> dict:
    e = set(extracted.lower().split())
    b = set(body.lower().split())
    inter = len(e & b)
    rec = inter / len(b) if b else 1.0
    # for a body-less page, precision = 1 iff nothing extracted
    prec = inter / len(e) if e else (1.0 if not b else 0.0)
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    return {
        "recall": round(rec, 4),
        "precision": round(prec, 4),
        "f1": round(f1, 4),
        "extracted_tokens": len(e),
        "body_tokens": len(b),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EXTRACTOR_EVAL.json")
    args = ap.parse_args()

    from vbb_data_pipeline_spark.sources.warc import (
        html_text,
        html_text_density,
    )

    report: dict = {"templates": {}, "aggregate": {}}
    agg = {"naive": [], "density": []}
    for run in range(5):  # 5 seeds per template class
        for name, html, body in templates(f"s{run}"):
            row = report["templates"].setdefault(name, {"naive": [], "density": []})
            for mode, fn in (("naive", html_text), ("density", html_text_density)):
                s = score(fn(html), body)
                row[mode].append(s)
                agg[mode].append(s)
    # aggregate: mean of per-page metrics, plus per-template means
    def mean(rows, k):
        return round(sum(r[k] for r in rows) / max(len(rows), 1), 4)

    for name, row in report["templates"].items():
        report["templates"][name] = {
            m: {k: mean(row[m], k) for k in ("recall", "precision", "f1")}
            for m in ("naive", "density")
        }
    for m in ("naive", "density"):
        report["aggregate"][m] = {
            k: mean(agg[m], k) for k in ("recall", "precision", "f1")
        }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report["aggregate"], indent=2))
    for name, row in report["templates"].items():
        print(
            f"{name:20s} naive R/P/F1 "
            f"{row['naive']['recall']}/{row['naive']['precision']}/{row['naive']['f1']}"
            f"   density {row['density']['recall']}/{row['density']['precision']}/{row['density']['f1']}"
        )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
