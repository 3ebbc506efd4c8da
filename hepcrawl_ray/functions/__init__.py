"""Scalar / string / date functions (the SURVEY.md §2.4 inventory).

Pure functions used inside ``map_batches`` UDF bodies — each mirrors
the *semantics* of a reference utility (cited per function) with a
fresh implementation.
"""

from hepcrawl_ray.functions.dates import create_valid_date, format_year, parse_date
from hepcrawl_ray.functions.misc import (
    build_dict,
    dedupe_list,
    dedupe_list_of_dicts,
    get_first,
    get_journal_and_section,
    get_licenses,
    has_numbers,
    range_as_string,
)
from hepcrawl_ray.functions.names import (
    collapse_initials,
    coll_cleanforthe,
    parse_author_str,
    split_fullname,
)
from hepcrawl_ray.functions.text import (
    clean_collaborations,
    clean_whitespace_characters,
    convert_html_subscripts_to_latex,
    remove_tags,
    remove_tags_with_content,
    translate_language,
)

__all__ = [
    "build_dict", "clean_collaborations", "clean_whitespace_characters",
    "collapse_initials", "coll_cleanforthe", "convert_html_subscripts_to_latex",
    "create_valid_date", "dedupe_list", "dedupe_list_of_dicts", "format_year",
    "get_first", "get_journal_and_section", "get_licenses", "has_numbers",
    "parse_author_str", "parse_date", "range_as_string", "remove_tags",
    "remove_tags_with_content", "split_fullname", "translate_language",
]
