"""parse_caption_batch == map(parse_caption): the vectorized Arrow
RE2 caption parser must be element-wise identical to the scalar
parser that defines the grammar's semantics — over the full synthetic
corpus (tags, collaborations, malformed rows) and over adversarial
strings probing every routing / edge path."""

import pyarrow as pa
import pytest

from hepcrawl_ray import synth
from hepcrawl_ray.caption import parse_caption, parse_caption_batch

ADVERSARIAL = [
    "",
    "   ",
    "just some text with no sections",
    "Authors: ???",
    "T. A. Authors: ??? Published: 2021. Type: Article.",
    # canonical full caption
    "Title one. Abstract here. Authors: A. B. Surname (Inst One). "
    "DOI: 10.1/x, 10.2/y. Published: 3 Mar 2021. Type: Article.",
    # no DOI section
    "T. Abs. Authors: C. Dee. Published: 2020-05. Type: PhD Thesis.",
    # DOI after Published (must be ignored)
    "T. Abs. Authors: C. Dee. Published: 2020 DOI: 10.9/z. Type: x.",
    # collaboration piece, multiple authors
    "T. Authors: A. One (X); B. Two for the ATLAS Collaboration. "
    "Published: May 2019. Type: Conference Proceedings.",
    # bare collaboration piece (no author part)
    "T. Authors: for the CMS Collaboration. Published: 1999. Type: a.",
    # institutional 'for the' (kept whole)
    "T. Authors: Institute for the Study of Things. Published: 1999. "
    "Type: a.",
    # comma-form name (python piece path)
    "T. Authors: Surname, G. I. (Aff). Published: 2001. Type: Article.",
    # empty / whitespace pieces, trailing semicolons
    "T. Authors: ; A. B. ;; C. Dee ; . Published: 2002. Type: t.",
    # author with no given names, no affiliation
    "T. Authors: Cher. Published: 2003. Type: Article.",
    # affiliation-only piece (degenerate)
    "T. Authors: (Aff Only). Published: 2003. Type: Article.",
    # 3-chain initials needing the fixpoint pass
    "T. Authors: A. B. C. Surname. Published: 2004. Type: Article.",
    # hyphen-separated initials
    "T. Authors: A.-B. Surname. Published: 2004. Type: Article.",
    # simple tags (vector cleanup)
    "Water in H<sub>2</sub>O and E<sup>2</sup>. Abs. Authors: "
    "<i>A. B.</i> Name. Published: 2005. Type: <b>Article</b>.",
    # <inf> alias
    "X<inf>n</inf>. Abs. Authors: A. N. Published: 2005. Type: a.",
    # attribute-laden tag -> scalar fallback route
    '<i class="x">T</i>. Abs. Authors: A. N. Published: 2005. Type: a.',
    # mismatched tag pair stays literal on both paths
    "A<sub>x</inf>B. Abs. Authors: A. N. Published: 2006. Type: a.",
    # unmatched opening tag stays literal
    "A<sub>xB. Abs. Authors: A. N. Published: 2006. Type: a.",
    # non-ascii -> scalar fallback route
    "Tïtle. Abs. Authors: A. Ñame. Published: 2007. Type: Article.",
    # head with no '. ' separator (title only, no abstract)
    "OnlyTitle Authors: A. B. Published: 2008. Type: Article.",
    # dots and stray whitespace everywhere
    "  T...  Abs.  Authors:  A.  B.  Name . DOI:  , 10.5/q ,, . "
    "Published:  14 February 1890 . Type:  proceedings  .",
    # 'Type:' appearing before 'Published:' only -> malformed
    "T. Authors: A. B. Type: t Published: 2009",
    # second Published/Type occurrences
    "T. Authors: A. B. Published: 2010 Type: t Published: z Type: q",
    # tab/newline whitespace collapse
    "T.\tAbs.\nAuthors: A.\nB. Name. Published: 2011. Type: a.",
    # unparseable date -> None at full precision
    "T. Abs. Authors: A. B. Published: someday soon. Type: a.",
]


def _batch_rows(caps):
    return pa.table(parse_caption_batch(pa.array(caps, pa.string()))) \
        .to_pylist()


@pytest.mark.parametrize("seed", [7, 11])
def test_corpus_parity(seed):
    images, _ = synth.generate_corpus(300, seed=seed)
    caps = images.column("caption").to_pylist()
    assert _batch_rows(caps) == [parse_caption(c) for c in caps]


def test_adversarial_parity():
    got = _batch_rows(ADVERSARIAL)
    want = [parse_caption(c) for c in ADVERSARIAL]
    for g, w, c in zip(got, want, ADVERSARIAL):
        assert g == w, f"caption {c!r}:\n batch {g}\n scalar {w}"


def test_each_adversarial_alone_and_mixed():
    """Row-order independence: each adversarial string parsed solo and
    interleaved with corpus captions gives the same struct."""
    images, _ = synth.generate_corpus(10, seed=3)
    base = images.column("caption").to_pylist()
    for c in ADVERSARIAL[:8]:
        solo = _batch_rows([c])[0]
        mixed = _batch_rows(base + [c])[-1]
        assert solo == mixed == parse_caption(c)


def test_empty_batch():
    out = parse_caption_batch(pa.array([], pa.string()))
    assert pa.table(out).num_rows == 0


def test_null_caption_is_malformed():
    out = pa.table(parse_caption_batch(pa.array([None], pa.string())))
    assert out.to_pylist() == [parse_caption("")]


def test_chunked_input():
    images, _ = synth.generate_corpus(40, seed=5)
    caps = images.column("caption").to_pylist()
    ch = pa.chunked_array([caps[:13], caps[13:]], pa.string())
    assert pa.table(parse_caption_batch(ch)).to_pylist() == \
        [parse_caption(c) for c in caps]
