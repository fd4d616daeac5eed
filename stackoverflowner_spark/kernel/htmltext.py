"""HTML -> sentinel-substituted plain text (the reference's extraction stage).

Re-implements the observable behavior of
``/root/reference/code/DataReader/read_so_post_info.py:55-151``
(``Extract_Text_From_XML``) without BeautifulSoup: a StackOverflow post body
is walked block by block; ``<pre><code>`` blocks and multi-line inline code
become ``CODE_BLOCK: Q_1 (code omitted for annotation)\n`` sentinels,
``<blockquote>`` becomes ``OP_BLOCK: (output omitted for annotation)\n``,
inline ``<code>`` is wrapped in ``--INLINE_CODE_BEGIN---/--INLINE_CODE_END---``
markers (with ``.`` doubled or ``?`` escaped as ``<?-?>`` so the sentence
splitter won't break inside), and ``<kbd>`` is wrapped in
``--KEYBOARD_IP_BEGIN---/--KEYBOARD_IP_END---``.

The reference's block counter is initialized to 1 and never incremented
(``read_so_post_info.py:46,77``), so every sentinel carries ``Q_1``; we
reproduce that faithfully (see golden files ``code/DataReader/text_files/``).

Byte-parity is asserted in ``tests/test_kernel_parity.py`` against the golden
``Posts_Small.xml`` -> ``text_files/*.txt`` pairs shipped with the reference.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Optional, Union


class ExtractionError(Exception):
    """Raised where the reference implementation would crash (e.g. a <kbd>
    element whose content is not a single text node). The Spark layer converts
    this into a lineage-flagged failed row instead of failing the job."""


_VOID_TAGS = frozenset(
    ["br", "hr", "img", "input", "meta", "link", "area", "base", "col", "embed",
     "source", "track", "wbr"]
)


class _Node:
    __slots__ = ("name", "children", "parent")

    def __init__(self, name: str, parent: Optional["_Node"] = None):
        self.name = name
        self.children: List[Union[str, "_Node"]] = []
        self.parent = parent

    # -- queries ---------------------------------------------------------- #

    def tag_names(self) -> List[str]:
        names = [self.name]
        for c in self.children:
            if isinstance(c, _Node):
                names.extend(c.tag_names())
        return names

    def find_all(self, name: str) -> List["_Node"]:
        found = []
        if self.name == name:
            found.append(self)
        for c in self.children:
            if isinstance(c, _Node):
                found.extend(c.find_all(name))
        return found

    def all_text(self) -> str:
        parts: List[str] = []
        for c in self.children:
            if isinstance(c, _Node):
                parts.append(c.all_text())
            else:
                parts.append(c)
        return "".join(parts)

    def sole_string(self) -> Optional[str]:
        """bs4 ``.string`` getter semantics: the single text child, recursing
        through an only-child chain; None otherwise."""
        if len(self.children) == 1:
            only = self.children[0]
            if isinstance(only, str):
                return only
            return only.sole_string()
        return None

    # -- mutation ---------------------------------------------------------- #

    def set_string(self, value: str) -> None:
        """bs4 ``.string`` setter semantics: replace all children."""
        self.children = [value]


class _FragmentParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[root]")
        self._cur = self.root

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            node = _Node(tag, self._cur)
            self._cur.children.append(node)
            return
        node = _Node(tag, self._cur)
        self._cur.children.append(node)
        self._cur = node

    def handle_startendtag(self, tag, attrs):
        self._cur.children.append(_Node(tag, self._cur))

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        # walk up to the nearest matching open element (tolerates stray ends)
        node = self._cur
        while node is not self.root and node.name != tag:
            node = node.parent
        if node is not self.root:
            self._cur = node.parent

    def handle_data(self, data):
        self._cur.children.append(data)


def parse_fragment(html_text: str) -> _Node:
    p = _FragmentParser()
    p.feed(html_text)
    p.close()
    return p.root


CODE_BLOCK_SENTINEL = "CODE_BLOCK: Q_1 (code omitted for annotation)\n"
OP_BLOCK_SENTINEL = "OP_BLOCK: (output omitted for annotation)\n"
INLINE_BEGIN = "--INLINE_CODE_BEGIN---"
INLINE_END = "--INLINE_CODE_END---"
KBD_BEGIN = "--KEYBOARD_IP_BEGIN---"
KBD_END = "--KEYBOARD_IP_END---"


def _transform_block(block: _Node) -> None:
    """Apply the reference's in-place substitutions to one top-level block."""
    tags = set(block.tag_names())

    if tags == {"pre", "code"}:
        # read_so_post_info.py:73-77 — replace the whole <pre> content
        pres = block.find_all("pre")
        if pres:
            pres[0].set_string(CODE_BLOCK_SENTINEL)
    elif "code" in tags:
        # read_so_post_info.py:82-106 — wrap each inline code span
        for code in block.find_all("code"):
            text = code.all_text().strip()
            if "\n" in text:
                code.set_string(CODE_BLOCK_SENTINEL)
            elif text.count(".") >= 1:
                code.set_string(
                    INLINE_BEGIN + text.replace(".", "..").replace("\r", "").replace("\n", "") + INLINE_END
                )
            elif text.count("?") >= 1:
                code.set_string(
                    INLINE_BEGIN + text.replace("?", "<?-?>").replace("\r", "").replace("\n", "") + INLINE_END
                )
            else:
                code.set_string(
                    INLINE_BEGIN + text.replace("\r", "").replace("\n", "") + INLINE_END
                )

    if "blockquote" in tags:
        # read_so_post_info.py:120-123 — only the FIRST blockquote is replaced
        quotes = block.find_all("blockquote")
        if quotes:
            quotes[0].set_string(OP_BLOCK_SENTINEL)

    if "kbd" in tags:
        # read_so_post_info.py:127-133 — uses the .string getter, which is
        # None for non-trivial content; the reference would crash there.
        for kbd in block.find_all("kbd"):
            s = kbd.sole_string()
            if s is None:
                raise ExtractionError("kbd element without a sole text child")
            kbd.set_string(KBD_BEGIN + s + KBD_END)


def extract_text(html_body: str) -> str:
    """Return the sentinel-substituted plain text for one post body.

    Mirrors ``Extract_Text_From_XML`` (read_so_post_info.py:55-151): the body
    is stripped, parsed, and walked top-level block by top-level block; each
    block contributes its (substituted) text plus a blank-line separator.
    Whitespace-only top-level text nodes contribute only the separator, like
    the reference's empty re-parse of stray "\\n\\n" nodes.
    """
    root = parse_fragment(html_body.strip())
    out: List[str] = []
    for child in root.children:
        if isinstance(child, str):
            out.append(child if child.strip() else "")
        else:
            _transform_block(child)
            out.append(child.all_text())
        out.append("\n\n")
    return "".join(out)
