"""Self-contained HTML DOM + XPath-subset evaluator.

The reference spiders select fields with lxml/parsel XPath strings (e.g.
``//a[contains(@id,'lnkToDetails_')]/@href`` — reference
``demo_crawl/spiders/immonet.py:99-100``).  lxml is not available in this
environment, so this module implements, from scratch on stdlib
``html.parser``, exactly the XPath subset those spiders use:

* axes: child (``/``), descendant-or-self (``//``), ``ancestor::``,
  ``following::``, ``preceding-sibling::``, ``following-sibling::``
* node tests: element name, ``*``, ``text()``
* predicates: ``[@a='v']``, ``[@a]``, ``[contains(@a,'v')]``,
  ``[contains(text(),'v')]``, ``[contains(.,'v')]``, ``[text()='v']``,
  positional ``[3]`` / ``[last()]`` (stacked predicates allowed)
* trailing ``/@attr`` and ``/text()`` (optionally indexed)
* parenthesised indexing ``(expr)[2]``
* ``normalize-space(expr)`` and bare numeric literals (parsel returns
  ``'1.0'`` for ``xpath("1")`` — the reference relies on this at
  ``immonet.py:150``)

Semantics follow lxml where they matter for byte-identity:
``text()`` yields the element's *direct* text children in document order;
``contains(text(), s)`` tests the first text node; attribute matches are
exact string equality (``@class="fotorama "`` keeps its trailing space).

This code runs inside Arrow-batched pandas UDFs (one DOM per row within a
batch) — the accepted vectorized-parse pattern for web-scale text: the
batch boundary is Arrow, the per-document work is necessarily sequential.
"""

from __future__ import annotations

import re
from bisect import bisect_right
from html.parser import HTMLParser
from functools import lru_cache

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class TextNode(str):
    """A text node that knows its parent element (needed for the
    ``text()[contains(.,'x')]/..`` pattern, e.g. ebay-klein.py:98).
    Behaves exactly like str everywhere else."""

    parent = None

    def __new__(cls, s, parent):
        o = str.__new__(cls, s)
        o.parent = parent
        return o


class Node:
    __slots__ = (
        "tag", "attrs", "children", "parent", "pos", "n_elem",
        "start", "end", "_idx",
    )

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = attrs
        self.children = []  # Node or str (text)
        self.parent = parent
        self.pos = 0  # index among parent's element children (doc order)
        self.n_elem = 0  # running count of element children (O(1) pos)
        self.start = 0  # preorder number (assigned by _doc_index)
        self.end = 0  # preorder number of last descendant
        self._idx = None  # document-order index, built lazily on the root

    # --- tree helpers -------------------------------------------------
    def iter_desc(self):
        """All descendant element nodes in document order."""
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c.iter_desc()

    def texts(self):
        """Direct text children (lxml ``text()`` semantics)."""
        return [c for c in self.children if isinstance(c, str)]

    def string_value(self):
        """XPath string-value: concatenation of all descendant text."""
        out = []

        def rec(n):
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    rec(c)

        rec(self)
        return "".join(out)

    def elem_children(self):
        return [c for c in self.children if isinstance(c, Node)]

    def __repr__(self):  # pragma: no cover
        return f"<Node {self.tag} {self.attrs}>"


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        parent = self.stack[-1]
        node = Node(tag, dict(attrs), parent)
        node.pos = parent.n_elem
        parent.n_elem += 1
        parent.children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        parent = self.stack[-1]
        node = Node(tag, dict(attrs), parent)
        node.pos = parent.n_elem
        parent.n_elem += 1
        parent.children.append(node)

    def handle_endtag(self, tag):
        # close the nearest open tag with this name (lenient, like lxml)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(TextNode(data, self.stack[-1]))


def parse_html(text: str) -> Node:
    b = _DomBuilder()
    b.feed(text)
    b.close()
    return b.root


class _DocIndex:
    """Document-order index over one parsed document.

    Preorder-numbers every node (elements AND text) and keeps per-tag /
    all-text / all-element lists in document order.  A descendant step
    from context node ``n`` is then a binary search over the start
    numbers — candidates are exactly the index entries with
    ``n.start < c.start <= n.end`` — instead of a full subtree walk per
    step (the measured hot path of the parse kernel: ~60% of per-URL CPU
    before this index, dominated by ``//tag[...]`` and
    ``//text()[contains(.,…)]`` scans).  Built lazily, once per document,
    amortized over the ~15 xpath() calls each portal parse makes."""

    __slots__ = ("by_tag", "tag_starts", "texts", "text_starts",
                 "elems", "elem_starts")

    def __init__(self, root: Node):
        by_tag = {}
        texts = []
        elems = []
        counter = 0

        def dfs(n):
            nonlocal counter
            for c in n.children:
                counter += 1
                if isinstance(c, Node):
                    c.start = counter
                    elems.append(c)
                    lst = by_tag.get(c.tag)
                    if lst is None:
                        by_tag[c.tag] = [c]
                    else:
                        lst.append(c)
                    dfs(c)
                    c.end = counter
                else:
                    c.start = counter
                    texts.append(c)

        root.start = 0
        dfs(root)
        root.end = counter
        self.by_tag = by_tag
        self.texts = texts
        self.elems = elems
        self.tag_starts = {t: [n.start for n in lst] for t, lst in by_tag.items()}
        self.text_starts = [t.start for t in texts]
        self.elem_starts = [n.start for n in elems]


def _doc_index(node: Node) -> _DocIndex:
    root = node
    while root.parent is not None:
        root = root.parent
    if root._idx is None:
        root._idx = _DocIndex(root)
    return root._idx


# ---------------------------------------------------------------------------
# XPath-subset parser / evaluator
# ---------------------------------------------------------------------------

_NUM_RE = re.compile(r"^\s*\d+(\.\d+)?\s*$")

# step grammar: axis::nodetest followed by [predicates]
_STEP_RE = re.compile(
    r"(?P<axis>ancestor|ancestor-or-self|following-sibling|preceding-sibling|"
    r"following|preceding|descendant|child|self|parent)::"
    r"|(?P<att>@[\w:-]+)"
    r"|(?P<test>[\w*:-]+(\(\))?)"
)


class _Step:
    __slots__ = ("axis", "test", "preds")

    def __init__(self, axis, test, preds):
        self.axis = axis  # 'child'|'desc'|'ancestor'|...
        self.test = test  # tag name | '*' | 'text()' | '@attr'
        self.preds = preds  # list of predicate callables / ints


def _split_top(s: str, sep: str):
    """Split on sep at bracket/quote depth 0."""
    parts, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def _parse_predicates(s: str):
    """Parse trailing [..][..] predicate chain; return (preds, rest_consumed)."""
    preds = []
    i = 0
    while i < len(s) and s[i] == "[":
        depth, q, j = 1, None, i + 1
        while j < len(s) and depth:
            ch = s[j]
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            j += 1
        preds.append(s[i + 1 : j - 1].strip())
        i = j
    return preds, i


_PRED_ATTR_EQ = re.compile(r"^@([\w:-]+)\s*=\s*(['\"])(.*)\2$", re.S)
_PRED_ATTR = re.compile(r"^@([\w:-]+)$")
_PRED_CONT_ATTR = re.compile(r"^contains\(\s*@([\w:-]+)\s*,\s*(['\"])(.*)\2\s*\)$", re.S)
_PRED_CONT_TEXT = re.compile(r"^contains\(\s*text\(\)\s*,\s*(['\"])(.*)\1\s*\)$", re.S)
_PRED_CONT_DOT = re.compile(r"^contains\(\s*\.\s*,\s*(['\"])(.*)\1\s*\)$", re.S)
_PRED_TEXT_EQ = re.compile(r"^text\(\)\s*=\s*(['\"])(.*)\1$", re.S)


def _compile_pred(p: str):
    if p == "last()":
        return "last"
    if p.isdigit():
        return int(p)
    m = _PRED_ATTR_EQ.match(p)
    if m:
        name, _, val = m.groups()
        return lambda n: isinstance(n, Node) and n.attrs.get(name) == val
    m = _PRED_CONT_ATTR.match(p)
    if m:
        name, _, val = m.groups()
        return lambda n: isinstance(n, Node) and val in (n.attrs.get(name) or "")
    m = _PRED_CONT_TEXT.match(p)
    if m:
        val = m.group(2)
        # lxml: contains(text(), s) uses the FIRST text node of the element
        return lambda n: isinstance(n, Node) and bool(n.texts()) and val in n.texts()[0]
    m = _PRED_CONT_DOT.match(p)
    if m:
        val = m.group(2)
        return lambda n: (
            val in n if isinstance(n, str) else val in n.string_value()
        )
    m = _PRED_TEXT_EQ.match(p)
    if m:
        val = m.group(2)
        return lambda n: isinstance(n, Node) and bool(n.texts()) and n.texts()[0] == val
    m = _PRED_ATTR.match(p)
    if m:
        name = m.group(1)
        return lambda n: isinstance(n, Node) and name in n.attrs
    # nested relative path predicate, e.g. [a/@href] — evaluate existence
    steps = _parse_steps(p)
    return lambda n: bool(_eval_steps([n], steps))


def _parse_steps(path: str):
    """Parse a location path (after leading / or //) into _Step list."""
    steps = []
    i = 0
    s = path
    while i < len(s):
        if s.startswith("//", i):
            axis = "desc"
            i += 2
        elif s.startswith("/", i):
            axis = "child"
            i += 1
        elif not steps:
            axis = "child"  # relative first step
        else:  # pragma: no cover
            raise ValueError(f"bad path at {s[i:]!r} in {path!r}")
        if s.startswith("..", i):
            steps.append(_Step("parent", "*", []))
            i += 2
            continue
        m = _STEP_RE.match(s, i)
        if not m:
            raise ValueError(f"bad step at {s[i:]!r} in {path!r}")
        if m.group("axis"):
            ax = m.group("axis")
            axis = {
                "descendant": "desc",
                "child": "child",
            }.get(ax, ax)
            i = m.end()
            m2 = _STEP_RE.match(s, i)
            if not m2 or m2.group("axis"):
                raise ValueError(f"bad axis step in {path!r}")
            m = m2
        if m.group("att"):
            test = m.group("att")
        else:
            # html.parser lowercases element tags; lower the test ONCE at
            # compile time instead of per _node_test call (was ~6M
            # .lower() calls per 400-seed parse)
            test = m.group("test")
            if test != "text()" and not test.startswith("@"):
                test = test.lower()
        i = m.end()
        preds_raw, consumed = _parse_predicates(s[i:])
        i += consumed
        steps.append(_Step(axis, test, [_compile_pred(p) for p in preds_raw]))
    return steps


def _axis_candidates(node: Node, axis: str):
    if axis == "child":
        return list(node.children) if isinstance(node, Node) else []
    if axis == "desc":
        out = []

        def rec(n):
            for c in n.children:
                out.append(c)
                if isinstance(c, Node):
                    rec(c)

        if isinstance(node, Node):
            rec(node)
        return out
    if axis == "self":
        return [node]
    if axis == "parent":
        return [node.parent] if node.parent else []
    if axis in ("ancestor", "ancestor-or-self"):
        out = [node] if axis == "ancestor-or-self" else []
        p = node.parent
        while p is not None and p.tag != "#document":
            out.append(p)
            p = p.parent
        return out
    if axis in ("following-sibling", "preceding-sibling"):
        if node.parent is None:
            return []
        sibs = node.parent.children
        idx = next(i for i, c in enumerate(sibs) if c is node)
        return sibs[idx + 1 :] if axis == "following-sibling" else sibs[:idx][::-1]
    if axis in ("following", "preceding"):
        # document-order traversal from the document root
        root = node
        while root.parent is not None:
            root = root.parent
        order = []

        def rec(n):
            for c in n.children:
                order.append(c)
                if isinstance(c, Node):
                    rec(c)

        rec(root)
        # following: everything after node's subtree end; exclude descendants
        if axis == "following":
            seen_self = False
            out = []
            in_subtree = set(id(d) for d in node.iter_desc()) | {id(node)}
            for c in order:
                if c is node:
                    seen_self = True
                    continue
                if seen_self and id(c) not in in_subtree:
                    out.append(c)
            return out
        else:
            out = []
            for c in order:
                if c is node:
                    break
                out.append(c)
            return out[::-1]
    raise ValueError(f"unsupported axis {axis}")


def _node_test(cand, test):
    if test == "text()":
        return isinstance(cand, str)
    if test == "*":
        return isinstance(cand, Node)
    if test.startswith("@"):
        return False  # handled at step level
    # test is lowercased at compile time (_parse_steps)
    return isinstance(cand, Node) and cand.tag == test


def _desc_candidates(n: Node, test: str):
    """Descendant candidates of ``n`` matching ``test``, in document
    order, via the per-document index: a bisect over preorder numbers
    replaces the full subtree walk."""
    idx = _doc_index(n)
    if test == "text()":
        lst, starts = idx.texts, idx.text_starts
    elif test == "*":
        lst, starts = idx.elems, idx.elem_starts
    else:
        lst = idx.by_tag.get(test)
        if lst is None:
            return []
        starts = idx.tag_starts[test]
    if n.parent is None:  # document root: everything matches
        return lst
    lo = bisect_right(starts, n.start)
    hi = bisect_right(starts, n.end)
    return lst[lo:hi]


def _apply_preds(matches, preds):
    for p in preds:
        if p == "last":
            matches = matches[-1:]
        elif isinstance(p, int):
            matches = [matches[p - 1]] if len(matches) >= p else []
        else:
            matches = [m for m in matches if p(m)]
    return matches


def _eval_steps(context, steps):
    cur = context
    for st in steps:
        multi_ctx = len(cur) > 1  # duplicates need overlapping contexts
        nxt = []
        if st.test.startswith("@"):
            name = st.test[1:]
            for n in cur:
                if isinstance(n, Node) and name in n.attrs:
                    nxt.append(n.attrs[name])
            cur = _apply_preds(nxt, st.preds)
            continue
        if st.axis in ("child", "self", "parent"):
            # positional predicates apply per parent context (lxml semantics
            # for //a/b[2]: second b under each a)
            for n in cur:
                cands = [
                    c for c in _axis_candidates(n, st.axis) if _node_test(c, st.test)
                ]
                nxt.extend(_apply_preds(cands, st.preds))
            cur = nxt
        elif st.axis == "desc" and any(
            p == "last" or isinstance(p, int) for p in st.preds
        ):
            # lxml: //div[2] = descendant-or-self::node()/child::div[2] —
            # positional predicates count within each PARENT's children
            for n in cur:
                if not isinstance(n, Node):
                    continue
                # descendant-or-self parents in preorder via the element
                # index (same order as [n, *n.iter_desc()], no recursion)
                for parent in [n, *_desc_candidates(n, "*")]:
                    cands = [
                        c for c in parent.children if _node_test(c, st.test)
                    ]
                    if cands:
                        nxt.extend(_apply_preds(cands, st.preds))
            cur = nxt
        elif st.axis == "desc":
            # indexed descendant scan (document-order bisect, no tree walk)
            preds = st.preds
            for n in cur:
                if not isinstance(n, Node):
                    continue
                cands = _desc_candidates(n, st.test)
                nxt.extend(_apply_preds(cands, preds) if preds else cands)
            cur = nxt
        else:
            for n in cur:
                cands = [
                    c for c in _axis_candidates(n, st.axis) if _node_test(c, st.test)
                ]
                nxt.extend(_apply_preds(cands, st.preds))
            cur = nxt
        # dedupe preserving order (duplicates only possible when multiple
        # context nodes overlap — e.g. nested contexts on a descendant
        # axis or siblings' parent; a single context can't produce them)
        if multi_ctx:
            seen = set()
            uniq = []
            for c in cur:
                k = id(c)
                if k not in seen:
                    seen.add(k)
                    uniq.append(c)
            cur = uniq
    return cur


def _matching_paren(s: str, start: int) -> int:
    depth, q = 0, None
    for i in range(start, len(s)):
        ch = s[i]
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced parens in {s!r}")


@lru_cache(maxsize=4096)
def _compile(expr: str):
    expr = expr.strip()
    if _NUM_RE.match(expr):
        val = float(expr)
        return ("literal", str(val))
    m = re.match(r"^normalize-space\((.*)\)$", expr, re.S)
    if m:
        inner = _compile(m.group(1))
        return ("normspace", inner)
    if expr.startswith("("):
        j = _matching_paren(expr, 0)
        node = _compile(expr[1:j])
        rest = expr[j + 1 :].strip()
        m = re.match(r"^\s*\[(\d+|last\(\))\]", rest)
        if m:
            idx = m.group(1)
            node = ("index", node, "last" if idx == "last()" else int(idx))
            rest = rest[m.end() :].strip()
        if rest:
            if not rest.startswith("/"):
                raise ValueError(f"bad trailing {rest!r} in {expr!r}")
            # (group)/further/steps — e.g. kalay.py:105,131
            node = ("chain", node, _parse_steps(rest))
        return node
    return ("path", _parse_steps(expr))


def _eval_compiled(c, context):
    kind = c[0]
    if kind == "literal":
        return [c[1]]
    if kind == "path":
        return _eval_steps(context, c[1])
    if kind == "index":
        res = _eval_compiled(c[1], context)
        if c[2] == "last":
            return res[-1:]
        return [res[c[2] - 1]] if len(res) >= c[2] else []
    if kind == "normspace":
        res = _eval_compiled(c[1], context)
        if not res:
            return [""]
        v = res[0]
        s = v if isinstance(v, str) else v.string_value()
        return [" ".join(s.split())]
    if kind == "chain":
        res = _eval_compiled(c[1], context)
        return _eval_steps(res, c[2])
    raise AssertionError(kind)


class XDoc:
    """parsel.Selector-alike over the mini-DOM.

    ``xpath(expr)`` returns an :class:`XList`; ``.get()`` / ``.getall()``
    mirror parsel (node results serialize to their string value — the
    reference only ever extracts ``text()`` / ``@attr`` so exact HTML
    re-serialization is not needed).
    """

    __slots__ = ("node",)

    def __init__(self, node: Node):
        self.node = node

    def xpath(self, expr: str) -> "XList":
        # lxml semantics: paths starting with '/' evaluate from the DOCUMENT
        # root even on a sub-element selector; './/' stays relative.
        e = expr.strip()
        rel = e.startswith(".")
        if rel:
            e = e[1:]
        if rel or not e.startswith(("/", "(")):
            ctx = [self.node]
        else:
            root = self.node
            while root.parent is not None:
                root = root.parent
            ctx = [root]
        return XList(_eval_compiled(_compile(e), ctx))


class XList(list):
    def get(self, default=None):
        if not self:
            return default
        v = list.__getitem__(self, 0)
        return v if isinstance(v, str) else v.string_value()

    def getall(self):
        return [v if isinstance(v, str) else v.string_value() for v in self]

    # parsel compat
    extract = getall
    extract_first = get

    def __getitem__(self, i):
        v = list.__getitem__(self, i)
        if isinstance(i, slice):
            return XList(v)
        return _Wrap(v)


class _Wrap:
    """Single-result wrapper so ``res[0].extract()`` works like parsel."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def extract(self):
        return self.v if isinstance(self.v, str) else self.v.string_value()

    get = extract


def doc(html: str) -> XDoc:
    return XDoc(parse_html(html))
