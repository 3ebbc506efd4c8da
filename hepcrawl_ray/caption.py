"""Caption parser: caption string -> hep-record-analog struct.

The per-record parse stage of the engine — the role the reference's
format parsers play (``ArxivParser.parse`` reference:
hepcrawl/parsers/arxiv.py:99-403, loader processors reference:
hepcrawl/loaders.py:47-204), over the synthetic caption grammar
defined in ``synth.py``:

1. strip presentation tags (<i>/<b>) keeping content
   (reference: hepcrawl/inputs.py:39-43)
2. HTML sub/sup -> LaTeX (reference: hepcrawl/inputs.py:31-36)
3. collapse whitespace (reference: hepcrawl/inputs.py:106-113)
4. section split (Authors/DOI/Published/Type), author struct
   completion with initials collapsing
   (reference: hepcrawl/inputs.py:46-66) and "for the X Collaboration"
   extraction (reference: hepcrawl/utils.py:260-282)
5. multi-format date -> ISO at its precision
   (reference: hepcrawl/dateutils.py:127-160)
6. doctype keyword classification
   (reference: hepcrawl/parsers/arxiv.py:376-386)

Malformed captions yield an *error row*, never an exception
(reference: hepcrawl/utils.py:492-502 error ParsedItem).
"""

from __future__ import annotations

import re

from hepcrawl_ray.functions import (
    clean_whitespace_characters,
    coll_cleanforthe,
    convert_html_subscripts_to_latex,
    create_valid_date,
    parse_author_str,
    remove_tags,
)

MALFORMED_MSG = "malformed caption: unparseable authors section"

_FOR_THE_RE = re.compile(r"\bfor\s+the\b", flags=re.I)
_HAS_ALPHA_RE = re.compile(r"[A-Za-z]")

EMPTY_RECORD = {
    "title": None, "abstract": None, "authors": [], "collaborations": [],
    "dois": [], "date_published": None, "document_type": None,
}


def classify_document_type(type_text: str) -> str:
    """Keyword classification (reference: hepcrawl/parsers/arxiv.py:376-386)."""
    low = type_text.lower()
    if "thesis" in low:
        return "thesis"
    if "proceeding" in low or "conference" in low:
        return "conference paper"
    return "article"


def parse_caption(caption: str) -> dict:
    """Parse one caption into the golden-record struct (+ ``error``)."""
    if "<" in caption:  # fast path: tag cleanup only when tags present
        cleaned = remove_tags(caption, which_ones=("i", "b"))
        cleaned = convert_html_subscripts_to_latex(cleaned)
    else:
        cleaned = caption
    cleaned = clean_whitespace_characters(cleaned)

    # section split by marker indices (order: Authors [DOI] Published Type)
    ia = cleaned.find("Authors:")
    ip = cleaned.find("Published:", ia + 1) if ia >= 0 else -1
    it = cleaned.find("Type:", ip + 1) if ip >= 0 else -1
    if ia < 0 or ip < 0 or it < 0:
        return {**EMPTY_RECORD, "error": MALFORMED_MSG}
    idoi = cleaned.find("DOI:", ia)
    if idoi >= ip:
        idoi = -1
    sec_authors = cleaned[ia + 8:idoi if idoi >= 0 else ip].strip()
    sec_dois = cleaned[idoi + 4:ip].strip() if idoi >= 0 else None
    sec_date = cleaned[ip + 10:it].strip()
    sec_type = cleaned[it + 5:].strip()
    if sec_type.endswith("."):
        sec_type = sec_type[:-1]

    head = cleaned[:ia].strip().rstrip(".")
    title, _, abstract = head.partition(". ")
    title = title.strip() or None
    abstract = abstract.strip() or None

    authors, collaborations = [], []
    auth_text = sec_authors.rstrip(".").strip()
    if not auth_text or not _HAS_ALPHA_RE.search(auth_text):
        return {**EMPTY_RECORD, "error": MALFORMED_MSG}
    for piece in auth_text.split(";"):
        piece = piece.strip()
        if not piece:
            continue
        if _FOR_THE_RE.search(piece):
            coll, author_part = coll_cleanforthe(piece)
            if coll:
                collaborations.append(coll)
            piece = author_part or ""
        if piece:
            authors.append(parse_author_str(piece))

    dois = []
    if sec_dois:
        for val in sec_dois.rstrip(".").split(","):
            val = val.strip()
            if val:
                dois.append({"value": val, "material": "publication"})

    date_published = create_valid_date(sec_date.rstrip("."))
    document_type = classify_document_type(sec_type)

    return {
        "title": title, "abstract": abstract, "authors": authors,
        "collaborations": collaborations, "dois": dois,
        "date_published": date_published, "document_type": document_type,
        "error": None,
    }


# ---------------------------------------------------------------------------
# vectorized batch parse (Arrow RE2 kernels; exact parse_caption parity)
# ---------------------------------------------------------------------------

# ASCII whitespace set of str.split() — RE2's \s misses \v, so the
# class is explicit everywhere it matters.
_WS = " \t\n\r\f\v"
_WS_RUN = r"[ \t\n\r\f\v]+"

# The tag shapes the vectorized cleanup handles exactly: bare i/b any
# case (remove_tags semantics), lowercase bare sub/sup/inf (_SUB_RE /
# _SUP_RE are case-sensitive).  A caption whose "<" inventory is not
# fully covered by these (attribute-laden tags, stray "<") routes to
# the scalar parser — the synthetic grammar never produces those.
_SIMPLE_TAGS = r"</?(?:[iIbB]|sub|sup|inf)>"
_IB_TAG = r"</?[iIbB]>"
# one leftmost-first pass over BOTH tags == Python's single _SUB_RE
# pass (non-participating group rewrites empty)
_SUBINF = r"<sub>(.*?)</sub>|<inf>(.*?)</inf>"
_SUP = r"<sup>(.*?)</sup>"

# section split: lazy groups reproduce str.find()'s first-occurrence
# semantics; the optional DOI branch is preferred at each position,
# matching `idoi >= 0 and idoi < ip`
_SECTIONS = (r"^(?P<head>.*?)Authors:(?P<authors>.*?)"
             r"(?:DOI:(?P<dois>.*?))?Published:(?P<date>.*?)"
             r"Type:(?P<rtype>.*)$")
_HEAD_SPLIT = r"^(?P<t>.*?)\. (?P<a>.*)$"     # str.partition(". ")
_AFF_TAIL = r"\([^)]*\)$"                     # affiliations suffix
_AFF_EXTRACT = r"\((?P<a>[^)]*)\)$"
_NAME_SPLIT = r"^(?P<g>.*) (?P<s>[^ ]+)$"     # greedy = last space
_FORTHE_SCAN = r"(?i)\bfor\s+the\b"
# lazy lead == re.split(maxsplit=1) at the FIRST 'for the'
_FORTHE_SPLIT = r"(?i)^(?P<lead>.*?)\bfor\s+the\b(?P<trail>.*)$"
_INITIALS_PAIR = r"([A-Z]\.)[ \t\n\r\f\v-]+([A-Z]\.)"

_AUTHOR_TYPE = None
_DOI_TYPE = None


def _golden_types():
    global _AUTHOR_TYPE, _DOI_TYPE
    if _AUTHOR_TYPE is None:
        from hepcrawl_ray.synth import GOLDEN_SCHEMA
        _AUTHOR_TYPE = GOLDEN_SCHEMA.field("authors").type.value_type
        _DOI_TYPE = GOLDEN_SCHEMA.field("dois").type.value_type
    return _AUTHOR_TYPE, _DOI_TYPE


def _np_str(arr):
    import numpy as np

    return np.asarray(arr.to_numpy(zero_copy_only=False))


def parse_caption_batch(captions):
    """Vectorized ``parse_caption`` over an Arrow string array.

    Returns ``{column: pa.Array}`` for the record fields + ``error``,
    element-wise identical to ``[parse_caption(c) for c in captions]``
    (pinned by tests/test_caption_batch.py over the full synthetic
    corpus and adversarial strings).  The grammar is regex-shaped, so
    everything hot runs in Arrow RE2 / numpy: tag cleanup, whitespace
    collapse, section split, DOI explosion, author/affiliation
    structuring.  Python executes only for (a) date normalization over
    the batch's UNIQUE date strings and (b) the rare piece bearing a
    collaboration marker or comma name — plus a whole-batch scalar
    fallback when a caption is non-ASCII or carries tag shapes outside
    the grammar (never in the synthetic corpus).

    Reference analog: the parse stage every spider callback runs
    (hepcrawl/parsers/arxiv.py:99-403); vectorization is ours.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    author_type, doi_type = _golden_types()
    if isinstance(captions, pa.ChunkedArray):
        captions = captions.combine_chunks()
    n = len(captions)

    def _scalar_path():
        recs = [parse_caption(c if c is not None else "")
                for c in captions.to_pylist()]
        out = {}
        for name in ("title", "abstract", "date_published",
                     "document_type", "error"):
            out[name] = pa.array([r[name] for r in recs], pa.string())
        out["authors"] = pa.array([r["authors"] for r in recs],
                                  pa.list_(author_type))
        out["collaborations"] = pa.array(
            [r["collaborations"] for r in recs], pa.list_(pa.string()))
        out["dois"] = pa.array([r["dois"] for r in recs],
                               pa.list_(doi_type))
        return out

    if n == 0:
        return _scalar_path()
    captions = pc.fill_null(captions, "")
    # routing: every "<" must belong to a simple known tag, ASCII only
    leftover = pc.replace_substring_regex(captions, pattern=_SIMPLE_TAGS,
                                          replacement="")
    simple = pc.and_(pc.string_is_ascii(captions),
                     pc.invert(pc.match_substring(leftover, "<")))
    if not pc.min(simple).as_py():
        return _scalar_path()

    # --- cleanup (remove_tags -> sub/sup latex -> whitespace) -------
    s = pc.replace_substring_regex(captions, pattern=_IB_TAG,
                                   replacement="")
    s = pc.replace_substring_regex(s, pattern=_SUBINF,
                                   replacement=r"$_{\1\2}$")
    s = pc.replace_substring_regex(s, pattern=_SUP,
                                   replacement=r"$^{\1}$")
    s = pc.utf8_trim(pc.replace_substring_regex(s, pattern=_WS_RUN,
                                                replacement=" "), _WS)

    # --- section split ----------------------------------------------
    sec = pc.extract_regex(s, pattern=_SECTIONS)
    ok = sec.is_valid()

    def _field(name):
        return pc.fill_null(pc.struct_field(sec, name), "")

    auth_sec = pc.utf8_trim(_field("authors"), _WS)
    auth_txt = pc.utf8_trim(pc.utf8_rtrim(auth_sec, "."), _WS)
    good = pc.and_(ok, pc.fill_null(
        pc.match_substring_regex(auth_txt, "[A-Za-z]"), False))
    good_np = _np_str(good).astype(bool)
    null_str = pa.scalar(None, pa.string())
    error = pc.if_else(good, null_str, pa.scalar(MALFORMED_MSG))

    # --- head -> title / abstract ------------------------------------
    head = pc.utf8_rtrim(pc.utf8_trim(_field("head"), _WS), ".")
    hp = pc.extract_regex(head, pattern=_HEAD_SPLIT)
    hm = hp.is_valid()
    title = pc.utf8_trim(
        pc.if_else(hm, pc.fill_null(pc.struct_field(hp, "t"), ""), head),
        _WS)
    abstract = pc.utf8_trim(
        pc.if_else(hm, pc.fill_null(pc.struct_field(hp, "a"), ""),
                   pa.scalar("")), _WS)
    empty_to_null = lambda x: pc.if_else(pc.equal(x, ""), null_str, x)
    title = pc.if_else(good, empty_to_null(title), null_str)
    abstract = pc.if_else(good, empty_to_null(abstract), null_str)

    # --- dois ---------------------------------------------------------
    dois_trim = pc.utf8_trim(_field("dois"), _WS)
    use = pc.and_(good, pc.invert(pc.equal(dois_trim, "")))
    doi_src = pc.if_else(use, pc.utf8_rtrim(dois_trim, "."),
                         pa.scalar(""))
    dl = pc.split_pattern(doi_src, ",")
    dvals = pc.utf8_trim(pc.list_flatten(dl), _WS)
    dparent = _np_str(pc.list_parent_indices(dl)).astype(np.int64)
    dkeep = _np_str(pc.invert(pc.equal(dvals, ""))).astype(bool)
    # "" splits to [""] -> trimmed "" -> dropped -> empty list
    kept_vals = dvals.filter(pa.array(dkeep))
    doi_counts = np.bincount(dparent[dkeep], minlength=n)
    doi_struct = pa.StructArray.from_arrays(
        [kept_vals,
         pa.array(["publication"] * len(kept_vals), pa.string())],
        fields=list(doi_type))
    dois = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(doi_counts))),
                 pa.int32()),
        doi_struct)

    # --- date (python over batch-unique strings only) ----------------
    date_key = pc.utf8_rtrim(pc.utf8_trim(_field("date"), _WS), ".")
    dk = _np_str(date_key).astype(str)
    uniq, inv = np.unique(dk, return_inverse=True)
    mapped = np.array([create_valid_date(u) if u else None
                       for u in uniq], dtype=object)
    date_vals = mapped[inv]
    date_vals[~good_np] = None
    date_published = pa.array(date_vals, pa.string())

    # --- document type -----------------------------------------------
    low = pc.utf8_lower(_field("rtype"))
    is_th = pc.match_substring(low, "thesis")
    is_cf = pc.or_(pc.match_substring(low, "proceeding"),
                   pc.match_substring(low, "conference"))
    doct = pc.if_else(is_th, pa.scalar("thesis"),
                      pc.if_else(is_cf, pa.scalar("conference paper"),
                                 pa.scalar("article")))
    document_type = pc.if_else(good, doct, null_str)

    # --- authors / collaborations -------------------------------------
    auth_work = pc.if_else(good, auth_txt, pa.scalar(""))
    pl = pc.split_pattern(auth_work, ";")
    piece_all = pc.utf8_trim(pc.list_flatten(pl), _WS)
    parent_all = _np_str(pc.list_parent_indices(pl)).astype(np.int64)
    pkeep = _np_str(pc.invert(pc.equal(piece_all, ""))).astype(bool)
    piece = piece_all.filter(pa.array(pkeep))
    parent = parent_all[pkeep]
    m = len(piece)

    # 'for the' collaboration split, vectorized (coll_cleanforthe) —
    # the heavy kernels run only on the MATCHING subset (one scan to
    # find it, then take/scatter), since collaboration pieces are a
    # small fraction of authors
    fm_np = _np_str(pc.match_substring_regex(
        piece, _FORTHE_SCAN)).astype(bool)
    py_collab = np.full(m, None, dtype=object)
    src = piece
    inst_full = np.zeros(m, dtype=bool)
    if fm_np.any():
        fidx = np.nonzero(fm_np)[0]
        fp = piece.take(pa.array(fidx, pa.int64()))
        lowp = pc.utf8_lower(fp)
        inst_sub = (_np_str(pc.match_substring(lowp, "institute"))
                    .astype(bool)
                    | _np_str(pc.match_substring(lowp, "university"))
                    .astype(bool))
        # stripping ".; " can neither create nor destroy the match,
        # so the split succeeds on every subset piece
        c0 = pc.utf8_trim(fp, ".; ")
        fex = pc.extract_regex(c0, pattern=_FORTHE_SPLIT)
        lead = pc.utf8_trim(
            pc.fill_null(pc.struct_field(fex, "lead"), ""), _WS)
        trail = pc.fill_null(pc.struct_field(fex, "trail"), "")
        lead_w = pc.fill_null(
            pc.match_substring_regex(lead, r"\w"), False)
        trail_w = pc.fill_null(
            pc.match_substring_regex(trail, r"\w"), False)
        coll_v = pc.utf8_trim(pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.if_else(trail_w, trail, c0),
                pattern=r"(?i)^ *the ", replacement=""),
            pattern=r"(?i) *collaborations? *", replacement=""), _WS)
        use_sub = ~inst_sub
        inst_full[fidx[inst_sub]] = True
        # author source: the lead (empty when it has no \w) replaces
        # the piece for non-institutional collaboration pieces
        author_src = pc.if_else(lead_w, lead, pa.scalar(""))
        mask_full = np.zeros(m, dtype=bool)
        mask_full[fidx[use_sub]] = True
        src = pc.replace_with_mask(
            piece, pa.array(mask_full),
            author_src.filter(pa.array(use_sub)))
        coll_np = _np_str(coll_v)
        setm = use_sub & (coll_np != "")
        py_collab[fidx[setm]] = coll_np[setm]

    # python routing: only institutional 'for the' pieces and comma
    # names (split_fullname's comma branch) remain scalar — the
    # synthetic grammar produces neither
    hascomma = _np_str(pc.match_substring(src, ",")).astype(bool)
    pymask = inst_full | hascomma
    vmask = ~pymask
    vidx = np.nonzero(vmask)[0]
    pidx = np.nonzero(pymask)[0]

    # vector pieces: affiliation suffix -> name split -> initials
    vp = src.filter(pa.array(vmask))
    aff_ex = pc.extract_regex(vp, pattern=_AFF_EXTRACT)
    aff_ok = aff_ex.is_valid()
    aff_content = pc.utf8_trim(
        pc.fill_null(pc.struct_field(aff_ex, "a"), ""), _WS)
    raw = pc.if_else(
        aff_ok,
        pc.utf8_trim(pc.replace_substring_regex(
            vp, pattern=_AFF_TAIL, replacement=""), _WS),
        vp)
    nm = pc.extract_regex(raw, pattern=_NAME_SPLIT)
    nm_ok = nm.is_valid()
    given = pc.if_else(nm_ok, pc.fill_null(pc.struct_field(nm, "g"), ""),
                       pa.scalar(""))
    surname = pc.if_else(nm_ok, pc.fill_null(pc.struct_field(nm, "s"), ""),
                         raw)
    # collapse_initials: fixpoint of pairwise separator removal ==
    # the scalar lookahead pass (both normal forms: no separator
    # between adjacent initials); >=2 passes only for 3+ chains
    while True:
        g2 = pc.replace_substring_regex(given, pattern=_INITIALS_PAIR,
                                        replacement=r"\1\2")
        if pc.all(pc.equal(g2, given)).as_py() is not False:
            break
        given = g2
    has_g = pc.invert(pc.equal(given, ""))
    full = pc.if_else(
        has_g, pc.binary_join_element_wise(surname, given, ", "),
        surname)

    # vector affiliations: 0/1 per author
    aff_has = _np_str(pc.invert(pc.equal(aff_content, ""))).astype(bool)
    v_aff_struct = pa.StructArray.from_arrays(
        [aff_content.filter(pa.array(aff_has))],
        fields=list(author_type.field("affiliations").type.value_type))
    v_affs = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(aff_has.astype(np.int64)))),
                 pa.int32()),
        v_aff_struct)

    # authorless collaboration leads yield no author row
    src_np = _np_str(src)
    has_author = np.zeros(m, dtype=bool)
    if len(vidx):
        has_author[vidx] = src_np[vidx] != ""

    # python pieces (institutional 'for the' / comma names): rare
    py_full, py_given, py_sur, py_affs = [], [], [], []
    if len(pidx):
        pieces_py = _np_str(piece)
        for pi in pidx:
            txt = pieces_py[pi]
            if fm_np[pi]:
                coll, author_part = coll_cleanforthe(txt)
                if coll:
                    py_collab[pi] = coll
                txt = author_part or ""
            if txt:
                a = parse_author_str(txt)
                has_author[pi] = True
                py_full.append(a["full_name"])
                py_given.append(a["given_names"])
                py_sur.append(a["surname"])
                py_affs.append(a["affiliations"])
            else:
                py_full.append("")
                py_given.append("")
                py_sur.append("")
                py_affs.append([])

    # merge: concat(vector, python) then take in piece order
    perm = np.empty(m, dtype=np.int64)
    perm[vidx] = np.arange(len(vidx))
    perm[pidx] = len(vidx) + np.arange(len(pidx))
    idx_auth = np.nonzero(has_author)[0]
    take_idx = pa.array(perm[idx_auth], pa.int64())

    def _merged(vec_arr, py_list, typ):
        py_arr = pa.array(py_list, typ)
        cat = pa.concat_arrays([vec_arr.combine_chunks()
                                if isinstance(vec_arr, pa.ChunkedArray)
                                else vec_arr, py_arr])
        taken = cat.take(take_idx)
        return taken.combine_chunks() \
            if isinstance(taken, pa.ChunkedArray) else taken

    affs_type = author_type.field("affiliations").type
    auth_struct = pa.StructArray.from_arrays(
        [_merged(full, py_full, pa.string()),
         _merged(given, py_given, pa.string()),
         _merged(surname, py_sur, pa.string()),
         _merged(v_affs, py_affs, affs_type)],
        fields=list(author_type))
    auth_counts = np.bincount(parent[idx_auth], minlength=n)
    authors = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(auth_counts))),
                 pa.int32()),
        auth_struct)

    cmask = np.array([c is not None for c in py_collab], dtype=bool)
    cidx = np.nonzero(cmask)[0]
    coll_counts = np.bincount(parent[cidx], minlength=n) if len(cidx) \
        else np.zeros(n, dtype=np.int64)
    collaborations = pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(coll_counts))),
                 pa.int32()),
        pa.array([py_collab[i] for i in cidx], pa.string()))

    return {
        "title": title, "abstract": abstract, "authors": authors,
        "collaborations": collaborations, "dois": dois,
        "date_published": date_published, "document_type": document_type,
        "error": error,
    }


# ---------------------------------------------------------------------------
# multi-format record parsing (ParsedItem.to_hep dispatch analog)
# ---------------------------------------------------------------------------

def parse_record(payload: str, record_format: str) -> dict:
    """Dispatch on record format, converging to ONE record schema.

    The reference accepts records in multiple formats ('hep' passes
    through patched, 'hepcrawl' goes through normalization; each source
    has its own parser class) and everything converges on the hep
    schema (reference: hepcrawl/utils.py:504-550 ``ParsedItem.to_hep``,
    hepcrawl/tohep.py:89-357).  Here: 'caption' (text grammar), 'json'
    and 'xml' payloads all normalize through the same field builders to
    the identical golden-record struct.
    """
    if record_format == "caption":
        return parse_caption(payload)
    if record_format == "json":
        return _parse_json_record(payload)
    if record_format == "xml":
        return _parse_xml_record(payload)
    if record_format == "marcxml":
        return _parse_marcxml_record(payload)
    if record_format == "hepcrawl":
        return _parse_hepcrawl_record(payload)
    return {**EMPTY_RECORD, "error": f"unknown record_format {record_format!r}"}


def _normalize_fields(title, abstract, author_strs, collab_strs, doi_strs,
                      raw_date, type_text) -> dict:
    """Shared normalization: the same builders every format goes through."""
    authors = [parse_author_str(a) for a in author_strs if a and a.strip()]
    collaborations = []
    for c in collab_strs:
        coll, _ = coll_cleanforthe(c)
        if coll:
            collaborations.append(coll)
    dois = [{"value": d.strip(), "material": "publication"}
            for d in doi_strs if d and d.strip()]
    return {
        "title": clean_whitespace_characters(title) if title else None,
        "abstract": clean_whitespace_characters(abstract) if abstract else None,
        "authors": authors,
        "collaborations": collaborations,
        "dois": dois,
        "date_published": create_valid_date(raw_date) if raw_date else None,
        "document_type": classify_document_type(type_text or ""),
        "error": None,
    }


def _parse_json_record(payload: str) -> dict:
    import json as _json

    try:
        rec = _json.loads(payload)
        return _normalize_fields(
            rec.get("title"), rec.get("abstract"),
            rec.get("authors", []), rec.get("collaborations", []),
            rec.get("dois", []), rec.get("date"), rec.get("type"))
    except Exception as exc:
        return {**EMPTY_RECORD, "error": f"bad json record: {exc}"}


def _parse_marcxml_record(payload: str) -> dict:
    """MARCXML -> the same golden struct, via the structural MARC
    parser (hepcrawl_ray.marc) and the shared field builders — the CDS
    branch of the reference's multi-format convergence
    (reference: hepcrawl/spiders/cds_spider.py:104-143)."""
    from hepcrawl_ray.marc import parse_marcxml

    rec = parse_marcxml(payload)
    if rec["error"]:
        return {**EMPTY_RECORD, "error": rec["error"]}
    return _normalize_fields(
        rec["title"], rec["abstract"],
        [a["full_name"] for a in rec["authors"]],
        rec["collaborations"], rec["dois"],
        rec["date_published"], rec["document_type"])


def _parse_hepcrawl_record(payload: str) -> dict:
    """Wide hepcrawl-format item (JSON) -> the same golden struct, via
    the full tohep normalization layer (reference: hepcrawl/tohep.py:
    89-357 — the 'hepcrawl' branch of ``ParsedItem.to_hep``,
    hepcrawl/utils.py:504-550)."""
    import json as _json

    from hepcrawl_ray.tohep import hepcrawl_to_hep, normalize_hepcrawl_record

    try:
        item = _json.loads(payload)
        source = item.get("acquisition_source", {}).get("source", "")
        rec = hepcrawl_to_hep(normalize_hepcrawl_record(item, source))
        title = rec.get("titles", [{}])[0].get("title")
        abstract = rec.get("abstracts", [{}])[0].get("value")
        return _normalize_fields(
            title, abstract,
            [a["full_name"] for a in rec.get("authors", [])],
            [c["value"] for c in rec.get("collaborations", [])],
            [d["value"] for d in rec.get("dois", [])],
            rec.get("imprints", [{}])[0].get("date"),
            rec["document_type"][0])
    except Exception as exc:
        return {**EMPTY_RECORD, "error": f"bad hepcrawl record: {exc}"}


def _parse_xml_record(payload: str) -> dict:
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(payload)

        def text(tag):
            el = root.find(tag)
            return el.text if el is not None else None

        return _normalize_fields(
            text("title"), text("abstract"),
            [el.text for el in root.findall("author")],
            [el.text for el in root.findall("collaboration")],
            [el.text for el in root.findall("doi")],
            text("date"), text("type"))
    except ET.ParseError as exc:
        return {**EMPTY_RECORD, "error": f"bad xml record: {exc}"}
