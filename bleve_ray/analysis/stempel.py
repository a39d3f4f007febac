"""Polish stemming via the Egothor/stempel stochastic patch trie.

The stemmer applies a TRAINED patch table: walking the word through a
trie yields a "diff command" string (R=replace, D=delete, I=insert,
-=skip), which is then applied right-to-left to the word.  The trained
table ``data/stempel_pl_20000.tbl`` is Apache Lucene's public Polish
stempel table (Apache-2.0; originally the Egothor project's trained
model over a Polish dictionary) — like the Snowball stop-word lists, it
is public DATA that cannot be re-derived and is included verbatim.  All
CODE here (the Java-DataOutput deserializer, trie walk and patch
applier) is an independent implementation of the published format and
semantics (reference role: analysis/lang/pl/stempel/*.go,
analysis/lang/pl/stemmer_pl.go:39-47).

Format (java.io.DataOutput, big-endian):
  file     := methodUTF (multiTrie | trie)   -- multi if method has 'M'
  multiTrie:= forwardBool byInt32 nTries {trie}
  trie     := forwardBool rootInt32 nCmds {cmdUTF} nRows {row}
  row      := nCells {charUint16 cell}
  cell     := cmdInt32 cntInt32 refInt32 skipInt32   (cnt/skip unused)
UTF strings are Java "modified UTF-8" (uint16 byte length prefix).
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Tuple

_DATA = os.path.join(os.path.dirname(__file__), "data",
                     "stempel_pl_20000.tbl")


class _JavaDataReader:
    """Minimal java.io.DataInput reader: big-endian scalars + modified
    UTF-8 strings (NUL as 2 bytes, no 4-byte sequences)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read_bool(self) -> bool:
        b = self.buf[self.pos]
        self.pos += 1
        return b != 0

    def read_i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def read_u16(self) -> int:
        (v,) = struct.unpack_from(">H", self.buf, self.pos)
        self.pos += 2
        return v

    def read_char(self) -> str:
        return chr(self.read_u16())

    def read_utf(self) -> str:
        n = self.read_u16()
        raw = self.buf[self.pos : self.pos + n]
        self.pos += n
        out: List[str] = []
        i = 0
        while i < n:
            c = raw[i]
            if c < 0x80:
                out.append(chr(c))
                i += 1
            elif c >> 4 in (12, 13):
                out.append(chr(((c & 0x1F) << 6) | (raw[i + 1] & 0x3F)))
                i += 2
            elif c >> 4 == 14:
                out.append(
                    chr(
                        ((c & 0x0F) << 12)
                        | ((raw[i + 1] & 0x3F) << 6)
                        | (raw[i + 2] & 0x3F)
                    )
                )
                i += 3
            else:
                raise ValueError("malformed modified-UTF-8")
        return "".join(out)


class _Trie:
    __slots__ = ("forward", "root", "cmds", "rows")

    def __init__(self, r: _JavaDataReader):
        self.forward = r.read_bool()
        self.root = r.read_i32()
        self.cmds = [r.read_utf() for _ in range(r.read_i32())]
        # row = {char: (cmd, ref)}
        self.rows: List[dict] = []
        for _ in range(r.read_i32()):
            cells = {}
            for _ in range(r.read_i32()):
                ch = r.read_char()
                cmd = r.read_i32()
                r.read_i32()  # cnt (training count, unused at runtime)
                ref = r.read_i32()
                r.read_i32()  # skip (unused at runtime)
                cells[ch] = (cmd, ref)
            self.rows.append(cells)

    def get_last_on_path(self, key: str) -> str:
        """Walk the key (reversed when not forward), remembering the most
        recent command seen; a row holding a command for the FINAL char
        wins outright."""
        if not (0 <= self.root < len(self.rows)):
            return ""
        row = self.rows[self.root]
        last = ""
        n = len(key)
        order = key if self.forward else key[::-1]
        for i in range(n - 1):
            ch = order[i]
            cell = row.get(ch)
            if cell is None:
                return last
            cmd, ref = cell
            if cmd >= 0:
                last = self.cmds[cmd]
            if ref < 0:
                return last
            row = self.rows[ref]
        cell = row.get(order[n - 1]) if n else None
        if cell is not None and cell[0] >= 0:
            return self.cmds[cell[0]]
        return last


_EOM = "*"


def _length_pp(cmd: str) -> int:
    """Consumed-key length of a patch command ('-'/'D' consume their
    parameter count, 'R' one, 'I' zero)."""
    rv = 0
    i = 0
    while i < len(cmd):
        c = cmd[i]
        if c in "-D":
            i += 1
            rv += ord(cmd[i]) - ord("a") + 1
        elif c == "R":
            i += 1
            rv += 1
        # 'I' consumes nothing
        i += 1
    return rv


class _MultiTrie:
    __slots__ = ("forward", "by", "tries")

    def __init__(self, r: _JavaDataReader):
        self.forward = r.read_bool()
        self.by = r.read_i32()
        self.tries = [_Trie(r) for _ in range(r.read_i32())]

    def _skip(self, s: str, count: int) -> Optional[str]:
        if count > len(s):
            return None
        return s[count:] if self.forward else s[: len(s) - count]

    def get_last_on_path(self, key: str) -> str:
        """Concatenate per-trie patch fragments; a fragment starting with
        '-' consumes key characters before the next trie sees the key.
        Stops on end-of-patch marker, empty fragment, or an illegal
        '-'/'D' repetition boundary."""
        rv = ""
        last_key = key
        prev = ""
        last_ch = " "
        for i, t in enumerate(self.tries):
            r = t.get_last_on_path(last_key)
            if not r or (len(r) == 1 and r[0] == _EOM):
                return rv
            if last_ch in "-D" and r[0] == last_ch:
                return rv
            last_ch = r[-2]
            if r[0] == "-":
                if i > 0:
                    skipped = self._skip(key, _length_pp(prev))
                    if skipped is None:
                        return rv
                    key = skipped
                skipped = self._skip(key, _length_pp(r))
                if skipped is None:
                    return rv
                key = skipped
            prev = r
            rv += r
            if key:
                last_key = key
        return rv


def apply_patch(dest: str, diff: str) -> str:
    """Apply an Egothor patch command string right-to-left: '-x' move
    left x, 'Rc' replace with c, 'Dx' delete x chars, 'Ic' insert c."""
    if not diff or not dest:
        return dest
    s = list(dest)
    pos = len(s) - 1
    for i in range(len(diff) // 2):
        cmd = diff[2 * i]
        param = diff[2 * i + 1]
        n = ord(param) - ord("a") + 1
        if cmd == "-":
            pos = pos - n + 1
        elif cmd == "R":
            if pos < 0 or pos >= len(s):
                return "".join(s)
            s[pos] = param
        elif cmd == "D":
            o = pos
            pos -= n - 1
            if pos < 0 or pos >= len(s):
                return "".join(s)
            del s[pos : o + 1]
        elif cmd == "I":
            pos += 1
            if pos < 0 or pos > len(s):
                return "".join(s)
            s.insert(pos, param)
        pos -= 1
    return "".join(s)


_TRIE_CACHE: dict = {}


def load_polish_trie(path: str = _DATA):
    """Parse (once per process) the trained patch table."""
    t = _TRIE_CACHE.get(path)
    if t is None:
        with open(path, "rb") as f:
            r = _JavaDataReader(f.read())
        method = r.read_utf()
        t = _MultiTrie(r) if "M" in method else _Trie(r)
        _TRIE_CACHE[path] = t
    return t


def polish_stem(term: str) -> str:
    """stemmer_pl semantics: look up the patch for the term, apply it.
    Unknown words (empty patch) pass through unchanged."""
    if not term:
        return term
    trie = load_polish_trie()
    return apply_patch(term, trie.get_last_on_path(term))
