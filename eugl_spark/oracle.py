"""Single-node pandas ORACLE for the quality-filter pipeline.

This is the "reference labels" implementation (SURVEY.md §5 tier 2):
plain Python `re` + integer counting over a pandas frame, written
independently of the Spark engine but sharing `constants.py` so both
sides use literally the same thresholds, regexes and model data.

The engine must match this oracle with keep/drop F1 ≥ 0.99 and
byte-identical `text_extracted` / `scrubbed_text` per url
(BASELINE.json metric). Float-bearing metrics are computed from
integer counts (n_seen·logp_seen + n_unseen·logp_unseen)/n so the
engine can reproduce them bit-exactly regardless of summation order —
the reference's rounding-for-stability pattern
(/root/reference/eugl/gqa/geometric_utils.py:475-477) taken to its
logical end.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from eugl_spark import constants as C

# C.RE_FLAGS (re.ASCII): pins \d/\s/\w/\b to the Java/RE2 semantics —
# see the contract note in constants.py
_TOKEN = re.compile(C.TOKEN_RE, C.RE_FLAGS)
_SYMBOL = re.compile(C.SYMBOL_RE, C.RE_FLAGS)
_SCRUB = [(re.compile(p, C.RE_FLAGS), r) for p, r in C.SCRUB_RULES]
_HTML = [(re.compile(p, C.RE_FLAGS), r) for p, r in C.HTML_STRIP_RULES]
_WS = re.compile(C.WHITESPACE_COLLAPSE_RE, C.RE_FLAGS)
_NL = re.compile(C.NEWLINE_COLLAPSE_RE, C.RE_FLAGS)
_TRIM = re.compile(C.TRIM_RE, C.RE_FLAGS)


def extract_text(html: bytes | None) -> str | None:
    r"""HTML → canonical text.

    >>> extract_text(b"<html><body><p>a b</p>\n<p>c &amp; d</p></body></html>")
    'a b\nc & d'
    >>> extract_text(None) is None
    True
    >>> extract_text(b"<script>x()</script><p>kept</p>")
    'kept'
    """
    if html is None:
        return None
    t = html.decode("utf-8", errors="replace")
    for pat, rep in _HTML:
        t = pat.sub(rep, t)
    for ent, ch in C.HTML_ENTITIES:
        t = t.replace(ent, ch)
    t = _WS.sub(" ", t)
    t = _NL.sub("\n", t)
    t = _TRIM.sub("", t)
    return t


def scrub_text(text: str) -> str:
    """Ordered PII/toxicity scrub (doctest-pinned, the reference's
    pure-function doctest pattern, /root/reference/eugl/fmask.py:92-100).

    >>> scrub_text("mail a@b.example.com or +1 555 123 4567 now")
    'mail <EMAIL> or <PHONE> now'
    >>> scrub_text("host 10.0.0.1 says grobnak")
    'host <IP> says <BAD>'
    >>> scrub_text("clean text stays identical")
    'clean text stays identical'
    """
    for pat, rep in _SCRUB:
        text = pat.sub(rep, text)
    return text


def detect_lang(tokens: list[str]) -> tuple[str, float]:
    s = " " + " ".join(tokens) + " "
    grams = [s[i : i + 3] for i in range(len(s) - 2)]
    if not grams:
        return "und", float("nan")
    best_lang, best_n = "und", -1
    for lang in C.LANGS:
        prof = C.TRIGRAM_PROFILES[lang]
        n = sum(1 for g in grams if g in prof)
        if n > best_n:
            best_lang, best_n = lang, n
    conf = best_n / len(grams)
    if conf < C.MIN_LANGID_CONFIDENCE:
        return "und", conf
    return best_lang, conf


def avg_nll(tokens: list[str], lang: str) -> float:
    table = C.BIGRAM_TABLES.get(lang)
    if table is None or len(tokens) < 2:
        return float("nan")
    n_pairs = len(tokens) - 1
    n_seen = sum(
        1 for a, b in zip(tokens[:-1], tokens[1:]) if (a, b) in table
    )
    n_unseen = n_pairs - n_seen
    return -(n_seen * C.SEEN_LOGPROB + n_unseen * C.UNSEEN_LOGPROB) / n_pairs


def label_row(
    url: str,
    html: bytes | None,
    text: str | None,
    boilerplate: bool = False,
) -> dict:
    """Full per-document verdict: the label the engine must reproduce.

    ``boilerplate=True`` mirrors apply_pipeline(boilerplate=True):
    html-only rows extract via the block classifier's main content
    (functions/boilerplate.py::content_text_py) instead of the
    whole-page strip; a page with no content blocks is no_content."""
    if boilerplate and text is None:
        from eugl_spark.functions.boilerplate import content_text_py

        ct = content_text_py(html) if html is not None else ""
        text_extracted = ct if ct != "" else None
    else:
        text_extracted = text if text is not None else extract_text(html)

    qa: dict = {
        "n_chars": None, "symbol_ratio": None, "n_words": None,
        "mean_word_len": None, "dup_line_fraction": None,
        "detected_lang": None, "langid_confidence": None,
        "stopword_fraction": None, "avg_nll": None,
    }
    out = {
        "url": url,
        "text_extracted": text_extracted,
        "scrubbed_text": None,
        "keep": False,
        "drop_reason": None,
        **{f"qa_{k}": v for k, v in qa.items()},
    }

    if text_extracted is None or text_extracted == "":
        out["drop_reason"] = "no_content"
        return out

    t = text_extracted
    out["scrubbed_text"] = scrub_text(t)
    n_chars = len(t)
    out["qa_n_chars"] = n_chars
    if n_chars < C.MIN_CHARS:
        out["drop_reason"] = "too_short"
        return out
    if n_chars > C.MAX_CHARS:
        out["drop_reason"] = "too_long"
        return out

    n_sym = len(_SYMBOL.findall(t))
    symbol_ratio = n_sym / n_chars
    out["qa_symbol_ratio"] = symbol_ratio
    if symbol_ratio > C.MAX_SYMBOL_RATIO:
        out["drop_reason"] = "symbol_ratio"
        return out

    lines = t.split("\n")
    dup_frac = 1.0 - len(set(lines)) / len(lines)
    out["qa_dup_line_fraction"] = dup_frac
    if dup_frac > C.MAX_DUP_LINE_FRACTION:
        out["drop_reason"] = "repetition"
        return out

    tokens = _TOKEN.findall(t.lower())
    n_words = len(tokens)
    out["qa_n_words"] = n_words
    if n_words < C.MIN_WORDS:
        out["drop_reason"] = "too_few_words"
        return out

    mean_wl = sum(len(w) for w in tokens) / n_words
    out["qa_mean_word_len"] = mean_wl
    if mean_wl < C.MIN_MEAN_WORD_LEN or mean_wl > C.MAX_MEAN_WORD_LEN:
        out["drop_reason"] = "word_length"
        return out

    lang, conf = detect_lang(tokens)
    out["qa_detected_lang"] = lang
    out["qa_langid_confidence"] = conf
    if lang not in C.TARGET_LANGS:
        out["drop_reason"] = "langid"
        return out

    sw = sum(1 for w in tokens if w in set(C.EN_STOPWORDS)) / n_words
    out["qa_stopword_fraction"] = sw
    if sw < C.MIN_STOPWORD_FRACTION:
        out["drop_reason"] = "stopword_fraction"
        return out

    nll = avg_nll(tokens, lang)
    out["qa_avg_nll"] = nll
    if not math.isnan(nll) and nll > C.MAX_AVG_NLL:
        out["drop_reason"] = "perplexity"
        return out

    out["keep"] = True
    return out


def label_frame(
    pages: pd.DataFrame, boilerplate: bool = False
) -> pd.DataFrame:
    """Oracle labels for a pages frame (url, html, text[, ...])."""
    rows = [
        label_row(r.url, r.html, r.text, boilerplate=boilerplate)
        for r in pages.itertuples(index=False)
    ]
    return pd.DataFrame(rows)
