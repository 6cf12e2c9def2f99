"""Pure-Python oracle: the reference's computational semantics, restated.

This module is the single-process ground truth the Spark engine is tested
against (byte-identical text per url). It is a fresh, compact restatement of
the behaviors documented in SURVEY.md §2 with reference citations — not a
copy of the reference code. Used only in tests; never on the Spark hot path.

Semantics sources (file:line of /root/reference/src/pdf_plumb):
  C1 anchor line clustering        core/extractor.py:221-235
  C3/C4 segment runs + aggregate   core/extractor.py:342-399
  C5 line bbox                     core/extractor.py:401-415
  O2 proportional spacing          core/extractor.py:628-700
  A1 width-weighted predominant    core/extractor.py:250-275
  W1/W2 gap_before/gap_after       core/extractor.py:277-330
  P1 blank filter + gap rederive   core/extractor.py:500-585
  A6/A7 contextual rules           core/analyzer.py:66-210
  O1 contextual classifier         core/analyzer.py:212-251
  C6 block formation               core/analyzer.py:693-819
  A2 block metadata                core/analyzer.py:821-853
  H1/H2 traditional candidates     core/analyzer.py:474-554
  H3 contextual candidates         core/analyzer.py:583-686
  H5 final boundaries              core/analyzer.py:1303-1340
"""

from __future__ import annotations

from collections import Counter
from typing import Any

Word = dict[str, Any]
Line = dict[str, Any]


def round_to_nearest(v: float, step: float) -> float:
    """helpers.py:8-13 — Python banker's rounding to a step."""
    return round(v / step) * step


def normalize_line(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", s).strip()


# ---------------------------------------------------------------- lines ---


def cluster_words_into_lines(words: list[Word], y_tol: float = 3.0) -> list[list[Word]]:
    """C1: anchor-semantics y clustering (extractor.py:221-235)."""
    ws = sorted(words, key=lambda w: w["top"])
    out: list[list[Word]] = []
    cur: list[Word] = []
    anchor = ws[0]["top"] if ws else 0.0
    for w in ws:
        if abs(w["top"] - anchor) > y_tol:
            out.append(cur)
            cur = [w]
            anchor = w["top"]
        else:
            cur.append(w)
    if cur:
        out.append(cur)
    return out


def combine_words_x(line_words: list[Word], x_tol: float = 3.0) -> list[Word]:
    """C2: merge next word into current when |next.x0 - cur.x1| <= x_tol
    (extractor.py:417-460). Note cur.x1 is always the previous word's x1
    regardless of merging, so the chain is lag-expressible."""
    ws = sorted(line_words, key=lambda w: w["x0"])
    merged: list[Word] = []
    cur = dict(ws[0])
    for nxt in ws[1:]:
        if abs(nxt["x0"] - cur["x1"]) <= x_tol:
            cur["text"] += nxt["text"]
            cur["x1"] = nxt["x1"]
        else:
            merged.append(cur)
            cur = dict(nxt)
    merged.append(cur)
    return merged


def make_segments(line_words: list[Word]) -> list[dict]:
    """C3/C4: split x-sorted words on (fontname,size,upright) change; text
    is the plain concatenation, stripped (extractor.py:342-399)."""
    ws = sorted(line_words, key=lambda w: w["x0"])
    runs: list[list[Word]] = []
    for w in ws:
        prev = runs[-1][-1] if runs else None
        if prev is not None and (
            prev.get("fontname") == w.get("fontname")
            and prev.get("size") == w.get("size")
            and prev.get("upright", True) == w.get("upright", True)
        ):
            runs[-1].append(w)
        else:
            runs.append([w])
    segs = []
    for run in runs:
        head = run[0]
        segs.append(
            {
                "font": head.get("fontname"),
                "reported_size": head.get("size"),
                "rounded_size": round(float(head.get("size", 0)) * 2) / 2,
                "direction": "upright" if head.get("upright", True) else "rotated",
                "text": "".join(w["text"] for w in run).strip(),
                "bbox": {
                    "x0": min(w["x0"] for w in run),
                    "top": min(w["top"] for w in run),
                    "x1": max(w["x1"] for w in run),
                    "bottom": max(w["bottom"] for w in run),
                },
            }
        )
    return segs


def proportional_spacing(segments: list[dict]) -> dict:
    """O2 (extractor.py:628-700): normalized + proportional line text."""
    keep = [s for s in segments if s["text"].strip()]
    if not keep:
        return {"text": "", "text_proportional": "", "proportional_spacing_info": []}
    if len(keep) == 1:
        t = keep[0]["text"]
        return {"text": t, "text_proportional": t, "proportional_spacing_info": []}
    info = []
    parts = [keep[0]["text"]]
    idx = len(keep[0]["text"])
    for prev, cur in zip(keep, keep[1:]):
        raw_gap = cur["bbox"]["x0"] - prev["bbox"]["x1"]
        fsize = prev.get("rounded_size") or prev.get("reported_size", 10)
        est = fsize * 0.3
        n = max(1, round(raw_gap / est))
        info.append(
            {
                "normalized_text_index": idx,
                "raw_gap_pt": round(raw_gap, 2),
                "estimated_space_width_pt": round(est, 2),
                "proportional_spaces": n,
            }
        )
        parts.append(" " * n)
        parts.append(cur["text"])
        idx += 1 + len(cur["text"])
    return {
        "text": " ".join(s["text"] for s in keep),
        "text_proportional": "".join(parts),
        "proportional_spacing_info": info,
    }


def build_lines(words: list[Word], page_num: int, page_width: float, page_height: float,
                y_tol: float = 3.0) -> dict:
    """Full per-page line construction (extractor.py:200-340)."""
    if not words:
        return {"page": page_num, "lines": [], "page_width": page_width,
                "page_height": page_height}
    lines_out: list[Line] = []
    prev_bottom = None
    for n, lw in enumerate(cluster_words_into_lines(words, y_tol), 1):
        ws = sorted(lw, key=lambda w: w["x0"])
        segs = make_segments(ws)
        bbox = {
            "x0": min(w["x0"] for w in ws),
            "top": min(w["top"] for w in ws),
            "x1": max(w["x1"] for w in ws),
            "bottom": max(w["bottom"] for w in ws),
        }
        prop = proportional_spacing(segs)
        # A1: width-weighted predominant size/font; ties -> first seen
        size_w: dict[float, float] = {}
        font_w: dict[str, float] = {}
        total_w = 0.0
        for s in segs:
            w_ = s["bbox"]["x1"] - s["bbox"]["x0"]
            total_w += w_
            size_w[s.get("rounded_size", 0)] = size_w.get(s.get("rounded_size", 0), 0) + w_
            f = s.get("font", "UnknownFont")
            font_w[f] = font_w.get(f, 0) + w_
        psize = max(size_w.items(), key=lambda kv: kv[1])[0] if size_w else None
        pfont = max(font_w.items(), key=lambda kv: kv[1])[0] if font_w else None
        size_cov = size_w[psize] / total_w * 100 if psize and total_w > 0 else 0
        font_cov = font_w[pfont] / total_w * 100 if pfont and total_w > 0 else 0
        if n == 1:
            gap_before = bbox["top"]
        else:
            gap_before = max(bbox["top"] - prev_bottom, 0)
        lines_out.append(
            {
                "line_number": n,
                "text": prop["text"],
                "text_proportional": prop["text_proportional"],
                "proportional_spacing_info": prop["proportional_spacing_info"],
                "bbox": bbox,
                "text_segments": segs,
                "predominant_size": psize,
                "predominant_font": pfont,
                "predominant_size_coverage": round(size_cov, 1),
                "predominant_font_coverage": round(font_cov, 1),
                "gap_before": gap_before,
            }
        )
        prev_bottom = bbox["bottom"]
    for a, b in zip(lines_out, lines_out[1:]):
        a["gap_after"] = max(b["bbox"]["top"] - a["bbox"]["bottom"], 0)
    lines_out[-1]["gap_after"] = max(page_height - lines_out[-1]["bbox"]["bottom"], 0)
    return {"page": page_num, "lines": lines_out, "page_width": page_width,
            "page_height": page_height}


def drop_blank_lines(pages: list[dict]) -> list[dict]:
    """P1 (extractor.py:500-585): remove blank lines; re-derive both gaps
    from nearest non-blank neighbours; renumber, keep original number."""
    out = []
    for pd in pages:
        src = pd.get("lines", [])
        keep = [ln for ln in src if ln.get("text", "").strip()]
        new_lines = []
        ph = pd.get("page_height", 0)
        for k, ln in enumerate(keep):
            nl = dict(ln)
            nl["original_line_number"] = ln.get("line_number")
            if k == 0:
                nl["gap_before"] = ln["bbox"]["top"]
            else:
                nl["gap_before"] = max(ln["bbox"]["top"] - keep[k - 1]["bbox"]["bottom"], 0)
            if k + 1 < len(keep):
                nl["gap_after"] = max(keep[k + 1]["bbox"]["top"] - ln["bbox"]["bottom"], 0)
            else:
                nl["gap_after"] = max(ph - ln["bbox"]["bottom"], 0)
            nl["line_number"] = k + 1
            new_lines.append(nl)
        np_ = dict(pd)
        np_["lines"] = new_lines
        out.append(np_)
    return out


# ------------------------------------------------------------- analysis ---


def collect_contextual_gaps(lines: list[Line], gap_rounding: float = 0.5) -> dict:
    """A6 (analyzer.py:66-120) over an already-flattened line list."""
    totals: dict[float, int] = {}
    for ln in lines:
        cs = ln.get("predominant_size")
        if cs is not None:
            totals[cs] = totals.get(cs, 0) + 1
    gaps: dict[float, list[float]] = {}
    for prev, cur in zip(lines, lines[1:]):
        cs = cur.get("predominant_size")
        if cs is not None and prev.get("predominant_size") == cs:
            g = cur.get("gap_before")
            if g is not None and g > 0.01:
                gaps.setdefault(cs, []).append(round(g / gap_rounding) * gap_rounding)
    return {cs: {"gaps": gs, "total_lines": totals.get(cs, 0)} for cs, gs in gaps.items()}


def spacing_rules(gaps_by_context: dict, lo=0.8, hi=1.2, para_mult=1.1) -> dict:
    """A7 (analyzer.py:122-210)."""
    rules = {}
    for cs, data in gaps_by_context.items():
        gl = data["gaps"]
        if not gl:
            continue
        counts = Counter(gl)
        mode = counts.most_common(1)[0][0]
        rng = (mode * lo, mode * hi)
        pmax = cs * para_mult
        rules[cs] = {
            "line_spacing_range": rng,
            "para_spacing_max": pmax,
            "most_common_gap": mode,
            "gap_distribution": dict(counts),
            "line_gaps": {g: c for g, c in sorted(counts.items()) if g <= rng[1]},
            "para_gaps": {g: c for g, c in sorted(counts.items()) if rng[1] < g <= pmax},
            "section_gaps": {g: c for g, c in sorted(counts.items()) if g > pmax},
            "total_gaps": len(gl),
            "total_lines": data["total_lines"],
        }
    return rules


def classify_gap(gap: float, context_size: float, rules: dict,
                 gap_rounding: float = 0.5) -> str:
    """O1 (analyzer.py:212-251)."""
    if context_size not in rules:
        ranked = sorted(rules.keys(), key=lambda s: rules[s]["total_gaps"], reverse=True)
        if not ranked:
            return "Line"
        context_size = ranked[0]
    r = rules[context_size]
    rg = round(gap / gap_rounding) * gap_rounding
    if rg <= r["line_spacing_range"][1]:
        return "Line"
    if rg <= r["para_spacing_max"]:
        return "Paragraph"
    return "Section"


def form_blocks(pages: list[dict], rules: dict) -> list[dict]:
    """C6/W3/A2 (analyzer.py:693-853)."""
    out = []
    for pd in pages:
        blocks: list[dict] = []
        cur = None
        for ln in pd.get("lines", []):
            if not ln.get("text", "").strip():
                continue
            size = ln.get("predominant_size")
            if size is None:
                continue
            gap = ln.get("gap_before", 0)
            join = (
                cur is not None
                and cur["predominant_size"] == size
                and size in rules
                and gap <= rules[size]["line_spacing_range"][1]
            )
            if join:
                cur["lines"].append(ln)
                cur["text_lines"].append(ln.get("text", ""))
                cur["text"] += "\n" + ln.get("text", "")
                bb, lb = cur["bbox"], ln["bbox"]
                bb["x0"] = min(bb["x0"], lb["x0"])
                bb["x1"] = max(bb["x1"], lb["x1"])
                bb["top"] = min(bb["top"], lb["top"])
                bb["bottom"] = max(bb["bottom"], lb["bottom"])
                cur["gap_after"] = gap
            else:
                if cur is not None:
                    _block_metadata(cur)
                    blocks.append(cur)
                cur = {
                    "lines": [ln],
                    "text_lines": [ln.get("text", "")],
                    "text": ln.get("text", ""),
                    "predominant_size": size,
                    "gap_before": gap,
                    "gap_after": 0,
                    "size_coverage": 0,
                    "predominant_font": None,
                    "font_coverage": 0,
                    "bbox": dict(ln["bbox"]),
                }
        if cur is not None:
            _block_metadata(cur)
            blocks.append(cur)
        for i in range(len(blocks)):
            if i > 0:
                blocks[i]["gap_before"] = blocks[i]["bbox"]["top"] - blocks[i - 1]["bbox"]["bottom"]
            if i < len(blocks) - 1:
                blocks[i]["gap_after"] = blocks[i + 1]["bbox"]["top"] - blocks[i]["bbox"]["bottom"]
        out.append({"page": pd.get("page"), "blocks": blocks})
    return out


def _block_metadata(block: dict) -> None:
    size_c: Counter = Counter()
    font_c: Counter = Counter()
    total = 0
    for ln in block["lines"]:
        for s in ln.get("text_segments", []):
            total += 1
            if s.get("rounded_size") is not None:
                size_c[s["rounded_size"]] += 1
            if s.get("font") is not None:
                font_c[s["font"]] += 1
    if total > 0:
        block["size_coverage"] = size_c.most_common(1)[0][1] / total
        mf = font_c.most_common(1)[0]
        block["predominant_font"] = mf[0]
        block["font_coverage"] = mf[1] / total


def base_spacing(lines: list[Line]) -> float:
    """A10 (analyzer.py:556-581): most common positive gap, prefer > 0.01."""
    sp = [ln["gap_before"] for ln in lines
          if ln.get("gap_before") is not None and ln["gap_before"] > 0]
    if not sp:
        return 0
    ranked = Counter(sp).most_common()
    for v, _ in ranked:
        if v > 0.01:
            return v
    return ranked[0][0]


def header_footer_candidates(pages: list[dict], target: str,
                             header_zone: float = 90.0,
                             footer_zone_inches: float = 1.0,
                             large_mult: float = 1.8) -> list[dict]:
    """H1/H2 (analyzer.py:474-554)."""
    cands = []
    page_height = pages[0].get("page_height", 792.0)
    footer_min_y = page_height - footer_zone_inches * 72.0
    for pd in pages:
        lines = pd.get("lines", [])
        base = base_spacing(lines)
        for i, ln in enumerate(lines):
            top, bottom = ln["bbox"].get("top"), ln["bbox"].get("bottom")
            if top is None or bottom is None:
                continue
            if target == "header" and top < header_zone and i + 1 < len(lines):
                gap = lines[i + 1]["bbox"]["top"] - bottom
                if gap >= large_mult * base:
                    cands.append({"page": pd.get("page"), "y_coord": bottom,
                                  "text": ln.get("text", ""), "gap": gap})
            elif target == "footer" and bottom > footer_min_y and i > 0:
                gap = top - lines[i - 1]["bbox"]["bottom"]
                if gap >= large_mult * base:
                    cands.append({"page": pd.get("page"), "y_coord": top,
                                  "text": ln.get("text", ""), "gap": gap})
    return cands


def contextual_candidates(pages: list[dict], target: str, rules: dict,
                          header_zone: float = 90.0,
                          footer_zone_inches: float = 1.0) -> list[dict]:
    """H3 (analyzer.py:583-686)."""
    cands = []
    page_height = pages[0].get("page_height", 792.0)
    footer_min_y = page_height - footer_zone_inches * 72.0
    for pd in pages:
        lines = pd.get("lines", [])
        for i, ln in enumerate(lines):
            top, bottom = ln["bbox"].get("top"), ln["bbox"].get("bottom")
            if top is None or bottom is None:
                continue
            if target == "header" and top < header_zone and i + 1 < len(lines):
                gap = ln.get("gap_after")
                if gap is not None:
                    gt = classify_gap(gap, ln.get("predominant_size", 0), rules)
                    if gt in ("Section", "Wide"):
                        cands.append({"page": pd.get("page"), "y_coord": bottom,
                                      "text": ln.get("text", ""), "gap": gap,
                                      "gap_type": gt})
            elif target == "footer" and bottom > footer_min_y and i > 0:
                gap = ln.get("gap_before")
                if gap is not None:
                    gt = classify_gap(gap, ln.get("predominant_size", 0), rules)
                    if gt in ("Section", "Wide"):
                        cands.append({"page": pd.get("page"), "y_coord": top,
                                      "text": ln.get("text", ""), "gap": gap,
                                      "gap_type": gt})
    return cands


def final_boundaries(header_votes: list[float], footer_votes: list[float],
                     page_height: float) -> tuple[float, float]:
    """H5/A11 (analyzer.py:1303-1340): mode with first-seen tie-break."""
    hb = Counter(header_votes).most_common(1)[0][0] if header_votes else 0.0
    ft = Counter(footer_votes).most_common(1)[0][0] if footer_votes else page_height
    return hb, ft


def h4_page_boundaries(lines: list[Line], page_height: float, base_spacing: float,
                       header_zone: float = 90.0, footer_zone_in: float = 1.0,
                       large_mult: float = 1.8, small_mult: float = 1.3
                       ) -> tuple[float, float]:
    """H4 (analyzer_head.py:26-228): iterative per-page boundary walk."""
    tops = [ln["bbox"]["top"] for ln in lines]
    bottoms = [ln["bbox"]["bottom"] for ln in lines]
    n = len(tops)
    footer_min = page_height - footer_zone_in * 72.0
    large, small = base_spacing * large_mult, base_spacing * small_mult

    hy, h_any, last_zone_bot = 0.0, False, 0.0
    for i in range(n):
        t, b = tops[i], bottoms[i]
        if i == 0 and t >= header_zone:
            break
        if t < header_zone:
            last_zone_bot = max(last_zone_bot, b)
            h_any = True
            if i + 1 < n:
                gap = max(tops[i + 1] - b, 0.0)
                if gap >= large:
                    hy = b
                    break
                if gap >= small:
                    hy = b
            else:
                hy = b
                break
        else:
            if h_any and hy == 0.0:
                hy = last_zone_bot
            break

    fy, f_any, first_zone_top = page_height, False, page_height
    for i in range(n - 1, -1, -1):
        t, b = tops[i], bottoms[i]
        if i == n - 1 and b <= footer_min:
            break
        if b > footer_min:
            first_zone_top = min(first_zone_top, t)
            f_any = True
            if i - 1 >= 0:
                gap = max(t - bottoms[i - 1], 0.0)
                if gap >= large:
                    fy = t
                    break
                if gap >= small:
                    fy = t
            else:
                fy = t
                break
        else:
            if f_any and fy == page_height:
                fy = first_zone_top
            break
    return round(hy, 1), round(fy, 1)


def extract_body_text(pages_lines: list[dict]) -> str:
    """Flagship: end-to-end main-content text for one document.

    blank-filter -> doc-wide rules -> blocks -> traditional header/footer
    votes -> final boundaries -> body = blocks fully inside the open
    interval (header_bottom, footer_top), pages in order, blocks joined by
    a blank line, block text as-is ('\\n'-joined line texts).
    """
    pages = drop_blank_lines(pages_lines)
    all_lines = [ln for pd in pages for ln in pd.get("lines", [])]
    if not all_lines:
        return ""
    rules = spacing_rules(collect_contextual_gaps(all_lines))
    blocks = form_blocks(pages, rules)
    # footer default = max line bottom across the doc: the reference passes
    # max_page_bottom to _determine_final_boundaries (analyzer.py:1473-1476)
    doc_bottom = max(ln["bbox"]["bottom"] for ln in all_lines)
    hv = [c["y_coord"] for c in header_footer_candidates(pages, "header")]
    fv = [c["y_coord"] for c in header_footer_candidates(pages, "footer")]
    hb, ft = final_boundaries(hv, fv, doc_bottom)
    parts = []
    for pd in blocks:
        for b in pd["blocks"]:
            if b["bbox"]["top"] >= hb and b["bbox"]["bottom"] <= ft:
                parts.append(b["text"])
    return "\n\n".join(parts)
