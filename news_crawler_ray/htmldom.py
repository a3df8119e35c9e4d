"""Minimal pure-Python DOM with lxml-compatible semantics.

lxml is not available in this environment, so the extraction kernel runs on
this stdlib ``html.parser`` DOM. It implements exactly the element
operations the reference consumes (girulea/News-Crawler
extraction_tools/explorer.py), with the same observable semantics:

- ``itertext`` / document order      → lxml Element.itertext / iter
- ``drop_tag`` / ``strip_tags``      → lxml semantics: element removed,
                                       text + children + tail spliced in
                                       place (explorer.py:31-38, 94-95)
- ``remove_keep_tail``               → explorer.py:218-234 remove_tail=True
                                       path: ``' ' + tail`` merged into the
                                       previous sibling's tail / parent text
- ``remove``                         → plain lxml ``parent.remove(el)``
                                       (node AND its tail dropped), used by
                                       outputformatters.py:119
- ``get_text``                       → explorer.py:241-248 + clean_text
                                       (415-418): whitespace-collapsed join
                                       of itertext chunks

NOTE (conformance): the reference's ``TreeExplorer.remove`` with default
``remove_tail=False`` is a **no-op** — its whole body sits under
``if parent is not None and remove_tail:`` (explorer.py:218-234). Callers
relying on the default (forms/input/select/hr removal, noise-regex node
removal, nav-hunter block removal, empty-tag removal, post-cleanup)
therefore do not alter the DOM in the reference. The kernel replicates this
observable behavior in reference mode; see extract/kernel.py.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Callable, Iterator

VOID_TAGS = frozenset(
    ["area", "base", "br", "col", "embed", "hr", "img", "input", "link",
     "meta", "param", "source", "track", "wbr"]
)

COMMENT = "!comment"  # comments are dropped at parse time (lxml parser with
#                       remove_comments=True — extractor.py:46)


class Node:
    """One DOM element. Mirrors the lxml Element surface the kernel uses."""

    __slots__ = ("tag", "attrib", "text", "tail", "children", "parent")

    def __init__(self, tag: str, attrib: dict[str, str] | None = None,
                 text: str | None = None, tail: str | None = None):
        self.tag = tag
        self.attrib: dict[str, str] = attrib or {}
        self.text = text
        self.tail = tail
        self.children: list[Node] = []
        self.parent: Node | None = None

    # -- attribute access ---------------------------------------------------
    def get(self, key: str, default: str | None = None) -> str | None:
        return self.attrib.get(key, default)

    def set(self, key: str, value: str) -> None:
        self.attrib[key] = value

    # -- structure ----------------------------------------------------------
    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def insert(self, index: int, child: "Node") -> None:
        child.parent = self
        self.children.insert(index, child)

    def index_of(self, child: "Node") -> int:
        for i, c in enumerate(self.children):
            if c is child:
                return i
        raise ValueError("child not found")

    def getprevious(self) -> "Node | None":
        if self.parent is None:
            return None
        i = self.parent.index_of(self)
        return self.parent.children[i - 1] if i > 0 else None

    def previous_siblings(self) -> list["Node"]:
        """lxml ``itersiblings(preceding=True)`` order: nearest first."""
        if self.parent is None:
            return []
        i = self.parent.index_of(self)
        return list(reversed(self.parent.children[:i]))

    def __len__(self) -> int:
        return len(self.children)

    def __iter__(self) -> Iterator["Node"]:
        return iter(self.children)

    # -- traversal ----------------------------------------------------------
    def iter(self, tag: str | None = None) -> Iterator["Node"]:
        """Pre-order document traversal including self (lxml Element.iter)."""
        if tag is None or self.tag == tag:
            yield self
        for c in self.children:
            yield from c.iter(tag)

    def iterdescendants(self, tag: str | None = None) -> Iterator["Node"]:
        for c in self.children:
            yield from c.iter(tag)

    def itertext(self) -> Iterator[str]:
        if self.text:
            yield self.text
        for c in self.children:
            yield from c.itertext()
            if c.tail:
                yield c.tail

    def find_all(self, pred: Callable[["Node"], bool]) -> list["Node"]:
        return [n for n in self.iter() if pred(n)]

    def find_by_tags(self, tags) -> list["Node"]:
        tagset = set(tags)
        return [n for n in self.iterdescendants() if n.tag in tagset]

    def find_first(self, tag: str) -> "Node | None":
        for n in self.iter(tag):
            return n
        return None

    # -- mutation -----------------------------------------------------------
    def remove(self, child: "Node") -> None:
        """Plain lxml ``parent.remove(el)``: node and its tail disappear."""
        self.children.remove(child)
        child.parent = None

    def drop_tree_keep_tail(self) -> None:
        """explorer.py:218-234 ``remove_tail=True``: merge ``' ' + tail``
        into the previous sibling's tail (or the parent's text), then drop
        the whole subtree."""
        parent = self.parent
        if parent is None:
            return
        if self.tail:
            prev = self.getprevious()
            if prev is None:
                parent.text = (parent.text or "") + " " + self.tail
            else:
                prev.tail = (prev.tail or "") + " " + self.tail
        parent.remove(self)

    def drop_tag(self) -> None:
        """lxml ``Element.drop_tag``: remove this element, splicing its
        text, children and tail into the parent at its position."""
        parent = self.parent
        if parent is None:
            return
        i = parent.index_of(self)
        prev = parent.children[i - 1] if i > 0 else None
        # merge leading text
        if self.text:
            if prev is not None:
                prev.tail = (prev.tail or "") + self.text
            else:
                parent.text = (parent.text or "") + self.text
        # splice children
        for off, c in enumerate(self.children):
            c.parent = parent
            parent.children.insert(i + off, c)
        last = self.children[-1] if self.children else None
        # merge tail
        if self.tail:
            if last is not None:
                last.tail = (last.tail or "") + self.tail
            elif prev is not None:
                prev.tail = (prev.tail or "") + self.tail
            else:
                parent.text = (parent.text or "") + self.tail
        self.children = []
        parent.children.remove(self)
        self.parent = None

    def copy(self) -> "Node":
        """Deepcopy of the subtree; the copy is detached (parent=None),
        matching ``copy.deepcopy`` of an lxml element — deepcopied top
        nodes therefore have NO siblings (newspaperlite/extractors.py:842,
        article.py:156-164: sibling adoption on a deepcopy is inert)."""
        n = Node(self.tag, dict(self.attrib), self.text, self.tail)
        for c in self.children:
            cc = c.copy()
            cc.parent = n
            n.children.append(cc)
        return n


def strip_tags(root: Node, *tags: str) -> None:
    """lxml ``etree.strip_tags``: drop_tag every matching descendant
    (not the root itself)."""
    tagset = set(tags)
    # repeat until fixpoint to handle nested matches spliced upward
    changed = True
    while changed:
        changed = False
        for n in list(root.iterdescendants()):
            if n.tag in tagset and n.parent is not None:
                n.drop_tag()
                changed = True


# ---------------------------------------------------------------------------
# Text helpers (explorer.py:241-248, 415-418, 270-288)
# ---------------------------------------------------------------------------

def get_text(node: Node | None, clean: bool = True) -> str:
    """``' ' + chunk`` concatenation over itertext, then whitespace
    collapse (explorer.py:241-248 + clean_text 415-418)."""
    if node is None:
        return ""
    result = ""
    for t in node.itertext():
        result += " " + t
    if clean:
        return " ".join(result.split())
    return result


def get_text_without_child(node: Node | None, clean: bool = True) -> str:
    txt = node.text if node is not None else None
    if clean:
        return " ".join(txt.split()) if isinstance(txt, str) else ""
    return txt or ""


def get_text_with_count(node: Node, tags_to_ignore=None, clean: bool = True):
    """(concatenated text, chunk count) — explorer.py:270-288. With
    ``tags_to_ignore``, only ``elem.text`` of non-ignored descendants is
    counted (tails skipped — reference quirk)."""
    result, count = "", 0
    if tags_to_ignore:
        ignore = set(tags_to_ignore)
        for elem in node.iter():
            if elem.tag not in ignore and elem.text is not None:
                text = elem.text
                if clean:
                    text = " ".join(text.split())
                if len(text) > 1:
                    result += " " + text
                    count += 1
    else:
        for t in node.itertext():
            t2 = " ".join(t.split())
            if len(t2) > 1:
                result += " " + t2
                count += 1
    return result, count


def subtree_width(node: Node) -> int:
    """Direct child count (explorer.py:398-404 default branch)."""
    return len(node.children)


def node_depth(node: Node) -> int:
    result = 0
    p = node.parent
    while p is not None:
        result += 1
        p = p.parent
    return result


def nearest_parent_by_tag(node: Node, tags) -> Node | None:
    tagset = set(tags)
    p = node.parent
    while p is not None:
        if p.tag in tagset:
            return p
        p = p.parent
    return None


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_RAW_TEXT_TAGS = frozenset(["script", "style"])


MAX_DOM_DEPTH = 200   # bounds tree recursion on hostile/degenerate pages


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#fragment")
        self.stack = [self.root]

    def _cur(self) -> Node:
        return self.stack[-1]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._cur().append(node)
        # depth cap: deeper elements become leaves (their content still
        # lands in the tree as text/siblings) so traversal recursion is
        # bounded on adversarial nesting
        if tag not in VOID_TAGS and len(self.stack) < MAX_DOM_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._cur().append(node)

    def handle_endtag(self, tag):
        # pop to the matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        cur = self._cur()
        if cur.children:
            last = cur.children[-1]
            last.tail = (last.tail or "") + data
        else:
            cur.text = (cur.text or "") + data

    def handle_comment(self, data):  # remove_comments=True parity
        pass

    def handle_decl(self, decl):
        pass


def parse_html(html: str) -> Node:
    """Parse an HTML document into a tree rooted at ``<html>`` (a synthetic
    html/body wrapper is added for fragments, as lxml.html does)."""
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    root = builder.root
    html_node = None
    for c in root.children:
        if c.tag == "html":
            html_node = c
            break
    if html_node is None:
        html_node = Node("html")
        body = Node("body")
        html_node.append(body)
        for c in root.children:
            body.append(c)
        if root.text:
            body.text = root.text
    else:
        html_node.parent = None
    if html_node.find_first("body") is None:
        body = Node("body")
        for c in list(html_node.children):
            if c.tag not in ("head", "body"):
                html_node.remove(c)
                body.append(c)
        html_node.append(body)
    return html_node
