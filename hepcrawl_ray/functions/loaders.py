"""Declarative per-field cleaning chains (HEPLoader analog).

The reference declares field processing as composable processor chains
on a loader class — ``MapCompose(f, g)`` input processors and
``TakeFirst()``/``Join()``/``ListToValueDict`` output processors
(reference: hepcrawl/loaders.py:47-204, hepcrawl/outputs.py:14-59).
Same surface here, as plain callables usable inside ``map_batches``
bodies; a ``FieldPipeline`` applies a chain spec to a record dict.
"""

from __future__ import annotations


class MapCompose:
    """Apply functions in sequence to EACH value of a list; a function
    returning None drops the value (reference: scrapy MapCompose
    semantics used throughout hepcrawl/loaders.py)."""

    def __init__(self, *fns):
        self.fns = fns

    def __call__(self, values):
        if not isinstance(values, (list, tuple)):
            values = [values]
        for fn in self.fns:
            out = []
            for v in values:
                if v is None:
                    continue
                r = fn(v)
                if r is not None:
                    out.append(r)
            values = out
        return values


class TakeFirst:
    """First non-null value or None (reference: hepcrawl/loaders.py
    *_out = TakeFirst())."""

    def __call__(self, values):
        for v in values:
            if v is not None and v != "":
                return v
        return None


class Join:
    def __init__(self, sep: str = " "):
        self.sep = sep

    def __call__(self, values):
        return self.sep.join(str(v) for v in values)


class ClassificationNumbers:
    """["11.30.Er"] -> [{"standard": "PACS", "classification_number":
    "11.30.Er"}] (reference: hepcrawl/outputs.py:30-44)."""

    def __init__(self, standard: str = "PACS"):
        self.standard = standard

    def __call__(self, values):
        return [{"standard": self.standard, "classification_number": v}
                for v in values if v is not None]


def list_to_value_dict(values, key: str = "value"):
    """["a","b"] -> [{"value": "a"}, {"value": "b"}]
    (reference: hepcrawl/outputs.py:42-59 ListToValueDict)."""
    return [{key: v} for v in values if v is not None]


class FieldPipeline:
    """Apply {field: (in_processor, out_processor)} chains to a dict."""

    def __init__(self, spec: dict):
        self.spec = spec

    def __call__(self, record: dict) -> dict:
        out = dict(record)
        for field, (proc_in, proc_out) in self.spec.items():
            if field not in out or out[field] is None:
                continue
            vals = proc_in(out[field]) if proc_in else out[field]
            out[field] = proc_out(vals) if proc_out else vals
        return out


def strict_kwargs(allowed: set[str]):
    """Constructor-kwargs guard (reference: hepcrawl/utils.py:338-382
    ``strict_kwargs`` decorator): unknown non-underscore kwargs raise."""
    def deco(fn):
        def wrapper(*args, **kwargs):
            bad = {k for k in kwargs
                   if not k.startswith("_") and k not in allowed}
            if bad:
                raise TypeError(f"unexpected kwargs: {sorted(bad)}")
            return fn(*args, **kwargs)
        return wrapper
    return deco
