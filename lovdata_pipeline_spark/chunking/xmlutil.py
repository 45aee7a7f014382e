"""Lenient XML parsing helpers on the standard library.

The reference parses Lovdata's HTML-flavored XML with lxml
(reference: domain/parsers/lovdata_chunker.py:68-69). lxml is not
available in this container, so we use ``xml.etree.ElementTree`` plus a
parent map (stdlib ET has no ``getparent``) and a small HTML-entity
shim. Semantics that matter downstream — document order of ``findall``,
``itertext`` flattening, attribute-equality predicates — are identical.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

# Minimal named-entity table for HTML-flavored documents; numeric
# references are handled by the parser itself.
_HTML_ENTITIES = {
    "&nbsp;": " ",
    "&amp;": "&amp;",  # keep
    "&laquo;": "«",
    "&raquo;": "»",
    "&ndash;": "–",
    "&mdash;": "—",
    "&sect;": "§",
    "&aring;": "å",
    "&oslash;": "ø",
    "&aelig;": "æ",
    "&Aring;": "Å",
    "&Oslash;": "Ø",
    "&AElig;": "Æ",
}

_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _HTML_ENTITIES if k != "&amp;"))


class XmlParseError(ValueError):
    """Raised when a document cannot be parsed; routed to the failed-docs
    side table by the Spark wrapper (poison documents must not kill the
    job — reference: tests/end2end/incremental_update_test.py:500-513).
    """


def parse_document(xml_text: str) -> ET.Element:
    """Parse one document string into an element tree root."""
    if xml_text is None or not xml_text.strip():
        raise XmlParseError("empty document")
    try:
        return ET.fromstring(xml_text)
    except ET.ParseError:
        # Retry with named HTML entities substituted.
        cleaned = _ENTITY_RE.sub(lambda m: _HTML_ENTITIES[m.group(0)], xml_text)
        try:
            return ET.fromstring(cleaned)
        except ET.ParseError as exc:
            raise XmlParseError(f"unparseable XML: {exc}") from exc


def build_parent_map(root: ET.Element) -> dict[ET.Element, ET.Element]:
    """Child → parent map enabling upward hierarchy walks."""
    return {child: parent for parent in root.iter() for child in parent}


def all_text(elem: ET.Element | None) -> str:
    """Flatten all descendant text (the reference's ``itertext`` join)."""
    if elem is None:
        return ""
    return "".join(elem.itertext()).strip()


def first_with_class(elem: ET.Element, tag: str, cls: str) -> ET.Element | None:
    """First descendant ``tag`` whose class attribute equals ``cls``."""
    return elem.find(f'.//{tag}[@class="{cls}"]')


def descendants_with_class(elem: ET.Element, tag: str, cls: str) -> list[ET.Element]:
    """All descendant ``tag`` elements with class == cls, document order."""
    return elem.findall(f'.//{tag}[@class="{cls}"]')
