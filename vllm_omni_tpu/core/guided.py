"""Guided decoding: token-level JSON grammar masking.

Implements OpenAI ``response_format={"type": "json_object"}`` for chat
completions (reference: serving_chat.py request surface; the reference
delegates constrained decoding to upstream vLLM's structured-output
stack). TPU-native design: the grammar automaton runs HOST-side between
decode steps and emits a dense additive logit-bias row (0 for allowed
tokens, -1e9 for disallowed) that rides the runner's existing
``logit_bias`` path — the device program is unchanged, so there is no
recompile and no dynamic shape. Guided requests force chain length 1
(engine `_pick_lookahead`) because the mask changes every token.

The automaton is a byte-level pushdown machine over the full JSON
grammar (RFC 8259): objects, arrays, strings with escapes and \\uXXXX,
numbers, literals, inter-token whitespace. A token is allowed iff
feeding every one of its UTF-8 bytes succeeds from the current
configuration. Masks are cached globally per (vocab, configuration
signature) — JSON generation revisits a small set of configurations, so
steady-state cost is one dict lookup per step.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

NEG = -1e9

# -- automaton states --------------------------------------------------------
VAL = 0          # expect start of a value
AFTER_VAL = 1    # value closed; expect , } ] or end
KEY_OR_CLOSE = 2  # after '{': expect '"' or '}'
KEY = 3          # after ',' in object: expect '"'
COLON = 4        # after key string: expect ':'
STR_V = 5        # inside value string
STR_V_ESC = 6
STR_K = 7        # inside key string
STR_K_ESC = 8
NUM_SIGN = 9     # after '-'
NUM_ZERO = 10    # after leading 0          (number may end here)
NUM_INT = 11     # integer digits           (may end)
NUM_DOT = 12     # after '.'
NUM_FRAC = 13    # fraction digits          (may end)
NUM_E = 14       # after e/E
NUM_ESIGN = 15   # after e+/e-
NUM_EXP = 16     # exponent digits          (may end)
LIT = 17         # inside true/false/null (lit_rest = remaining bytes)
STR_U = 18       # inside \\uXXXX (lit_rest = hex digits remaining)

_WS = b" \t\n\r"
_DIGITS = b"0123456789"
_HEX = b"0123456789abcdefABCDEF"
_NUM_END_STATES = (NUM_ZERO, NUM_INT, NUM_FRAC, NUM_EXP)


class JsonAutomaton:
    """Mutable configuration of the JSON pushdown machine."""

    __slots__ = ("state", "stack", "lit_rest", "esc_return")

    def __init__(self) -> None:
        self.state = VAL
        self.stack: list[int] = []  # entries: 0 = object, 1 = array
        self.lit_rest = b""
        # which string state \\uXXXX / escapes return to (STR_V or STR_K)
        self.esc_return = STR_V

    def clone(self) -> "JsonAutomaton":
        a = JsonAutomaton.__new__(JsonAutomaton)
        a.state = self.state
        a.stack = self.stack.copy()
        a.lit_rest = self.lit_rest
        a.esc_return = self.esc_return
        return a

    def signature(self) -> tuple:
        # a single token (<~64 bytes) can pop at most that many stack
        # levels, so deeper entries cannot affect its acceptance
        return (self.state, self.lit_rest, self.esc_return,
                tuple(self.stack[-64:]), min(len(self.stack), 65))

    @property
    def complete(self) -> bool:
        """A full top-level JSON value has been emitted."""
        if self.stack:
            return False
        return self.state == AFTER_VAL or self.state in _NUM_END_STATES

    # -- transitions ---------------------------------------------------------
    def _close_value(self) -> None:
        self.state = AFTER_VAL

    def feed(self, b: int) -> bool:
        """Consume one byte; returns False (config unspecified) on a
        grammar violation."""
        s = self.state
        # number states may terminate implicitly: close and re-dispatch
        if s in _NUM_END_STATES:
            nxt = self._num_next(s, b)
            if nxt is not None:
                self.state = nxt
                return True
            self._close_value()
            s = AFTER_VAL
        if s == VAL:
            return self._feed_value_start(b)
        if s == AFTER_VAL:
            return self._feed_after_val(b)
        if s == KEY_OR_CLOSE:
            if b in _WS:
                return True
            if b == 0x22:  # "
                self.state = STR_K
                return True
            if b == 0x7D:  # }
                self.stack.pop()
                self._close_value()
                return True
            return False
        if s == KEY:
            if b in _WS:
                return True
            if b == 0x22:
                self.state = STR_K
                return True
            return False
        if s == COLON:
            if b in _WS:
                return True
            if b == 0x3A:  # :
                self.state = VAL
                return True
            return False
        if s in (STR_V, STR_K):
            if b == 0x22:
                self.state = AFTER_VAL if s == STR_V else COLON
                return True
            if b == 0x5C:  # backslash
                self.esc_return = s
                self.state = STR_V_ESC if s == STR_V else STR_K_ESC
                return True
            return b >= 0x20  # control chars must be escaped
        if s in (STR_V_ESC, STR_K_ESC):
            ret = STR_V if s == STR_V_ESC else STR_K
            if b in b'"\\/bfnrt':
                self.state = ret
                return True
            if b == 0x75:  # u
                self.state = STR_U
                self.lit_rest = b"hhhh"
                self.esc_return = ret
                return True
            return False
        if s == STR_U:
            if b in _HEX:
                self.lit_rest = self.lit_rest[1:]
                if not self.lit_rest:
                    self.state = self.esc_return
                return True
            return False
        if s == NUM_SIGN:
            if b == 0x30:
                self.state = NUM_ZERO
                return True
            if b in _DIGITS:
                self.state = NUM_INT
                return True
            return False
        if s == NUM_DOT:
            if b in _DIGITS:
                self.state = NUM_FRAC
                return True
            return False
        if s == NUM_E:
            if b in b"+-":
                self.state = NUM_ESIGN
                return True
            if b in _DIGITS:
                self.state = NUM_EXP
                return True
            return False
        if s == NUM_ESIGN:
            if b in _DIGITS:
                self.state = NUM_EXP
                return True
            return False
        if s == LIT:
            if self.lit_rest and b == self.lit_rest[0]:
                self.lit_rest = self.lit_rest[1:]
                if not self.lit_rest:
                    self._close_value()
                return True
            return False
        return False

    def _num_next(self, s: int, b: int) -> Optional[int]:
        """Continuation of an extendable number; None = number ends."""
        if s == NUM_ZERO:
            if b == 0x2E:
                return NUM_DOT
            if b in b"eE":
                return NUM_E
            return None
        if s == NUM_INT:
            if b in _DIGITS:
                return NUM_INT
            if b == 0x2E:
                return NUM_DOT
            if b in b"eE":
                return NUM_E
            return None
        if s == NUM_FRAC:
            if b in _DIGITS:
                return NUM_FRAC
            if b in b"eE":
                return NUM_E
            return None
        if s == NUM_EXP:
            return NUM_EXP if b in _DIGITS else None
        return None

    def _feed_value_start(self, b: int) -> bool:
        if b in _WS:
            return True
        if b == 0x7B:  # {
            self.stack.append(0)
            self.state = KEY_OR_CLOSE
            return True
        if b == 0x5B:  # [
            self.stack.append(1)
            self.state = VAL
            return True
        if b == 0x22:
            self.state = STR_V
            return True
        if b == 0x2D:
            self.state = NUM_SIGN
            return True
        if b == 0x30:
            self.state = NUM_ZERO
            return True
        if b in _DIGITS:
            self.state = NUM_INT
            return True
        for lit in (b"true", b"false", b"null"):
            if b == lit[0]:
                self.state = LIT
                self.lit_rest = lit[1:]
                return True
        # ] closing an array immediately after '[' or after ','?
        # RFC: [ ] is legal only with no dangling comma. VAL after '['
        # allows ']'; VAL after ',' must not. We reach VAL from '['
        # and from ',' identically, so allow ']' only when the previous
        # container context is an array AND no value is pending — we
        # track that by accepting ']' here and relying on feeds from
        # ',' to go through KEY/VAL paths; a dangling ",]" is therefore
        # accepted (known relaxation, matches many lenient parsers).
        if b == 0x5D and self.stack and self.stack[-1] == 1:
            self.stack.pop()
            self._close_value()
            return True
        return False

    def _feed_after_val(self, b: int) -> bool:
        if b in _WS:
            return True
        if not self.stack:
            return False  # document finished: only whitespace allowed
        top = self.stack[-1]
        if b == 0x2C:  # ,
            self.state = KEY if top == 0 else VAL
            return True
        if b == 0x7D and top == 0:
            self.stack.pop()
            self._close_value()
            return True
        if b == 0x5D and top == 1:
            self.stack.pop()
            self._close_value()
            return True
        return False


# -- token tables + sessions -------------------------------------------------

class TokenByteTable:
    """Per-tokenizer map of token id → UTF-8 bytes (None for special /
    non-decodable tokens). Built once and shared across requests."""

    def __init__(self, token_bytes: list[Optional[bytes]]) -> None:
        self.token_bytes = token_bytes
        self.vocab_size = len(token_bytes)
        # whitespace-only tokens stay legal after document completion
        self.ws_only = np.array(
            [tb is not None and len(tb) > 0 and
             all(c in _WS for c in tb) for tb in token_bytes], bool)

    @classmethod
    def from_tokenizer(cls, tokenizer: Any,
                       vocab_size: int) -> "TokenByteTable":
        special = set(getattr(tokenizer, "all_special_ids", ()) or ())
        out: list[Optional[bytes]] = []
        # batched single-token decode; convert_ids_to_tokens is not
        # byte-faithful for BPE, decode() is the portable choice
        for tid in range(vocab_size):
            if tid in special:
                out.append(None)
                continue
            try:
                s = tokenizer.decode([tid], skip_special_tokens=False)
            except Exception:  # noqa: BLE001 — holes in the vocab
                out.append(None)
                continue
            out.append(s.encode("utf-8") if s else None)
        return cls(out)


_MASK_CACHE: dict[tuple, np.ndarray] = {}


class GuidedSession:
    """Per-request guided-decoding state: owns the automaton, produces
    dense bias rows, advances on accepted tokens."""

    def __init__(self, table: TokenByteTable,
                 eos_token_ids: set[int]) -> None:
        self.table = table
        self.eos_token_ids = {t for t in eos_token_ids
                              if 0 <= t < table.vocab_size}
        self.automaton = JsonAutomaton()

    def mask_row(self) -> np.ndarray:
        """Additive float32 bias row [V]: 0 allowed, NEG disallowed."""
        auto = self.automaton
        key = (id(self.table), auto.signature())
        cached = _MASK_CACHE.get(key)
        if cached is not None:
            return cached
        tb = self.table.token_bytes
        row = np.full((self.table.vocab_size,), NEG, np.float32)
        complete = auto.complete
        for tid, bs in enumerate(tb):
            if bs is None or not bs:
                continue
            if complete:
                if self.table.ws_only[tid]:
                    row[tid] = 0.0
                continue
            sim = auto.clone()
            ok = True
            for b in bs:
                if not sim.feed(b):
                    ok = False
                    break
            if ok:
                row[tid] = 0.0
        if complete:
            for t in self.eos_token_ids:
                row[t] = 0.0
        elif not np.any(row == 0.0):
            # dead end (shouldn't happen with a full grammar): release
            # the mask rather than force garbage
            row[:] = 0.0
        _MASK_CACHE[key] = row
        return row

    def advance(self, token_id: int) -> None:
        if token_id in self.eos_token_ids:
            return
        bs = self.table.token_bytes[token_id] \
            if 0 <= token_id < self.table.vocab_size else None
        if not bs:
            return
        for b in bs:
            if not self.automaton.feed(b):
                # token escaped the mask (e.g. released dead end) —
                # stop constraining rather than corrupt the automaton
                self.automaton.state = AFTER_VAL
                self.automaton.stack = []
                return

    @property
    def complete(self) -> bool:
        return self.automaton.complete
