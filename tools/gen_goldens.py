"""Generate golden outputs from the compiled reference via tl_oracle.

Deterministic (seed=42). Writes tests/goldens/corpus.jsonl with one
JSON object per case: {"html": ..., "selectors": [...], "oracle": {...}}.
Run from repo root:  python tools/gen_goldens.py
Requires cargo + the tl_oracle binary (dev-time only; goldens are
committed so CI/pytest never needs Rust).
"""

from __future__ import annotations

import base64
import json
import random
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ORACLE = REPO / "tools/tl_oracle/target/release/tl_oracle"
OUT = REPO / "tests/goldens/corpus.jsonl"

SELECTORS = [
    ".a", "#x", "div", "p.b", ".a .b", ".a>.b", "div,p", "[href]",
    "[class^=a]", '[data-x="1"]', "*", "img[src]", "[title~=w]",
    "span.a.b", "#x,#y,.a", "[class$=b]", "[class*=a]",
]

TAGS = ["div", "p", "span", "a", "b", "i", "ul", "li", "script", "style",
        "nav", "main", "DIV", "P", "foo-bar", "x:y", "h1"]
VOIDS = ["br", "img", "hr", "meta", "input", "BR", "IMG"]
TEXTS = ["hello", "a &amp; b", "x < y", "tail ", " spaced ", "üñíçø∂é",
         "a&#65;b", "", "line\nbreak", "tab\there"]
ATTR_KEYS = ["id", "class", "href", "data-x", "title", "ID", "src"]
ATTR_VALS = ["a", "b", "a b", "x", "1", "og:title", "/path", "two words",
             "", "ü"]


def fixed_cases():
    """Hand-picked quirk inputs (FIXTURES.md §3 + extras)."""
    return [
        "abc <p>test<span>a</span></p> def",
        "<p>hello <p>nested element</p></p>",
        "<div>a<!-- c -->b<span>c</span></div>",
        "<p>a &amp; b &lt;c&gt; &#65;</p>",
        '<script>var x = "<div>hi</div>";</script>',
        "no tags at all",
        "<div><p>one<p>two</div>",
        '<html><head></head><body><img src=""><br><hr></body></html>',
        '<span contenteditable="true">testing</a>',
        "<BR><p>t</p>",
        "<br/><p>x</p>",
        "<div><p>x</div></p>",
        '<p\tid="x">t</p>',
        '<p\r\nid="x">t</p>',
        '<p a = "x">t</p>',
        '<a x="1" x="2">t</a>',
        "a < b and c",
        "a <b",
        "<a href=/about>x</a>",
        "<p ",
        "<! foo><p>t</p>",
        '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN"><p>t</p>',
        "<!-- never ends <p>x</p>",
        "<div>t</DIV>",
        "",
        "<!-- test -->",
        "<!-- a -- b -->",
        "<!doctype html>hello",
        '<div></div><p id="test"></p><p></p>',
        '<div id="u"><p class="c">x',
        '<DIV ID="x">t</DIV>',
        '<p class="a b">hey</p>',
        '<div class="a"><p class="b">x</p></div>',
        '<div class="a b">x</div>',
        '<div><meta property="og:title" content="hello" /></div>',
        '<img src="cool.png" />',
        "<p>test</p><div><span>test2</span></div>",
        "<div><p>haha</p></div>",
        "<p>abcd</p>",
        "<p>abcd</p><span>ef</span>",
        "<p>abcd</p",
        "<br /><p>test</p>",
        '<div id="a"><div id="b"><span>Hello</span><span>World</span>'
        "<span>!</span></div></div>",
        '<div><img src="a.png">text</div>',
        "J\x00<",
        "<!J",
        "<=/Fy<=/",
        "<!-->x",
        "<!--->x",
        "<!---->x",
        "<---->",
        "< p>t</p>",
        "</p>only close",
        "<p>>double</p>",
        "<p><><</p>",
        "<a href='single'>q</a>",
        "<a href=unquoted next=1>q</a>",
        "<a href=>empty</a>",
        "<a disabled>v</a>",
        "<a disabled checked>v</a>",
        '<a id="dup"><b id="dup">x</b></a>',
        '<p id="o"><p id="o">i</p></p>',
        "<svg><path d=M0/></svg>",
        "<p> &nbsp;</p>",
        "<div>" * 40 + "deep" + "</div>" * 40,
        "<!doctype HTML>x",
        "<!dOcTyPe hTmL>x",
        "<!doctypehtml>x",
        "<!doctype xml>x",
        '<input type="checkbox" checked>',
        "<p =\"weird\">t</p>",
        "<p ==x>t</p>",
        '<a x="1" x="2" x="3">t</a>',
        '<a k1="1" k2="2" k3="3" k1="9">t</a>',
    ]


def rand_attr(rng):
    k = rng.choice(ATTR_KEYS)
    style = rng.randrange(4)
    if style == 0:
        return k
    v = rng.choice(ATTR_VALS)
    if style == 1:
        return f'{k}="{v}"'
    if style == 2:
        return f"{k}='{v}'"
    return f"{k}={v.replace(' ', '_') or 'v'}"


def rand_doc(rng, depth=0):
    n = rng.randrange(1, 5)
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30 or depth > 6:
            parts.append(rng.choice(TEXTS))
        elif r < 0.38:
            v = rng.choice(VOIDS)
            attrs = " ".join(rand_attr(rng) for _ in range(rng.randrange(3)))
            sep = " " if attrs else ""
            close = rng.choice(["", "/", " /"])
            parts.append(f"<{v}{sep}{attrs}{close}>")
        elif r < 0.44:
            parts.append(rng.choice([
                "<!-- c -->", "<!--x-->", "<!-- a -- b -->", "<!-->",
            ]))
        elif r < 0.50:
            # malformed fragments
            parts.append(rng.choice([
                "a < b", "<p", "</nope>", "<a href=/x>y</a>", "< div>z</div>",
                "<p >ok</p>", "<p\t>t</p>",
            ]))
        else:
            t = rng.choice(TAGS)
            attrs = " ".join(rand_attr(rng) for _ in range(rng.randrange(4)))
            sep = " " if attrs else ""
            inner = rand_doc(rng, depth + 1)
            if rng.random() < 0.15:
                parts.append(f"<{t}{sep}{attrs}>{inner}")  # unclosed
            elif rng.random() < 0.1:
                parts.append(f"<{t}{sep}{attrs}>{inner}</{t.lower()}>")
            else:
                parts.append(f"<{t}{sep}{attrs}>{inner}</{t}>")
    return "".join(parts)


FRAGMENTS = [
    "<", ">", "</", "<!", "<!-", "<!--", "-->", "--", "=", '"', "'", "/",
    "/>", " ", "\n", "\t", "\r", "a", "div", "p", "id", "class", "x=1",
    'id="z"', "<p", "<div>", "</div>", "</p>", "<br>", "&amp;", "\x00",
    "!", "doctype", "<!doctype html>", "<!DOCTYPE", "html", "=\"", "=='",
    "<=", "=/", "<a href=", "?", "#", ".", "[", "]", "~=", "^=", "ü",
]


def rand_soup(rng):
    """Adversarial structured byte soup: concatenated dangerous
    fragments — exercises every tokenizer edge simultaneously."""
    return "".join(
        rng.choice(FRAGMENTS) for _ in range(rng.randrange(3, 40))
    )


def main():
    rng = random.Random(42)
    cases = fixed_cases()
    for _ in range(400):
        cases.append(rand_doc(rng))
    for _ in range(300):
        cases.append(rand_soup(rng))

    lines = []
    for html in cases:
        fields = [base64.b64encode(html.encode()).decode()]
        fields += [
            base64.b64encode(s.encode()).decode() for s in SELECTORS
        ]
        lines.append("\t".join(fields))

    proc = subprocess.run(
        [str(ORACLE)],
        input="\n".join(lines).encode(),
        stdout=subprocess.PIPE,
        check=True,
    )
    out_lines = proc.stdout.decode().splitlines()
    assert len(out_lines) == len(cases), (len(out_lines), len(cases))

    OUT.parent.mkdir(parents=True, exist_ok=True)
    with OUT.open("w") as f:
        for html, oline in zip(cases, out_lines):
            rec = {
                "html": html,
                "selectors": SELECTORS,
                "oracle": json.loads(oline),
            }
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
    print(f"wrote {len(cases)} goldens to {OUT}")


if __name__ == "__main__":
    sys.exit(main())
