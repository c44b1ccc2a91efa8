"""A small finite-state-machine parser for nested document structure.

Fresh implementation of the semantics of the reference's FSMParser
(ref ferenda/fsmparser.py:13-268): ordered recognizers, a transition
table mapping ``(state, recognizer) → (constructor|False, newstate)``,
a peekable chunk stream, and recursive ``make_children`` that builds the
nested tree. Constructors that open a nested scope carry a ``newstate``
attribute (ref ferenda/decorators.py newstate decorator).

FSM parsing is inherently sequential per document but embarrassingly
parallel across documents — this engine only ever runs inside the
Arrow-batched extraction UDF, never on the driver.
"""

from __future__ import annotations

from collections import deque


class FSMStateError(Exception):
    """No recognizer matched the next chunk in the current state
    (ref ferenda/fsmparser.py:150-152)."""


class Peekable:
    def __init__(self, iterable):
        self._it = iter(iterable)
        self._cache = deque()

    def __iter__(self):
        return self

    def __next__(self):
        if self._cache:
            return self._cache.popleft()
        return next(self._it)

    next = __next__

    def peek(self, n: int = 1):
        while len(self._cache) < n:
            self._cache.append(next(self._it))
        return self._cache[n - 1]


def newstate(state):
    """Mark a constructor as opening a nested scope named ``state``."""
    def decorate(fn):
        fn.newstate = state
        return fn
    return decorate


class FSMParser:
    def __init__(self):
        self.recognizers: tuple = ()
        self.transitions: dict = {}
        self.initial_state = None
        self.initial_constructor = None
        self.reader: Peekable | None = None
        self._state_stack: list = []

    def set_recognizers(self, *recognizers):
        self.recognizers = recognizers

    def set_transitions(self, transitions: dict):
        self.transitions = {}
        for (before, after) in transitions.items():
            before_states, recognizer = before
            if not isinstance(before_states, (list, tuple)):
                before_states = [before_states]
            for state in before_states:
                self.transitions[(state, recognizer)] = after

    def parse(self, chunks):
        self.reader = Peekable(chunks)
        self._state_stack = [self.initial_state]
        return self.initial_constructor(self)

    # -- internals mirroring the reference's control flow ---------------

    def _analyze_symbol(self):
        try:
            self.reader.peek()
        except StopIteration:
            return None
        state = self._state_stack[-1]
        applicable = [r for r in self.recognizers
                      if (state, r) in self.transitions]
        for recognizer in applicable:
            if recognizer(self):
                return recognizer
        raise FSMStateError(
            "No recognizer match in state %r for %r" %
            (state, str(self.reader.peek())[:60]))

    def _transition(self, state, symbol):
        t = self.transitions[(state, symbol)]
        if callable(t) and not isinstance(t, tuple):
            return t(symbol, self._state_stack)
        return t

    def make_child(self, constructor, childstate):
        self._state_stack.append(childstate or self._state_stack[-1])
        try:
            return constructor(self)
        finally:
            self._state_stack.pop()

    def make_children(self, parent):
        while True:
            symbol = self._analyze_symbol()
            if symbol is None:
                return parent
            constructor, new = self._transition(self._state_stack[-1], symbol)
            if new and not hasattr(constructor, "newstate"):
                self._state_stack[-1] = new
            if constructor:
                try:
                    element = self.make_child(constructor, new)
                except StopIteration:
                    return parent
                if element is not None:
                    parent.append(element)
            else:
                if new:
                    # change the state we'll return to
                    # (ref ferenda/fsmparser.py:243-252)
                    self._state_stack[-2] = new
                return parent
