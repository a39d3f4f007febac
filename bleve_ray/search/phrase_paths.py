"""Sloppy phrase-path discovery over a term-location map.

Faithful re-expression of the reference's findPhrasePaths
(search/searcher/search_phrase.go:415-507): given per-term location
lists for ONE document+field, enumerate every way the phrase slots can
be laid onto distinct locations such that the summed positional edit
distance stays within ``slop``.

Semantics preserved exactly:

- a slot may hold several candidate terms (multi-phrase / fuzzy /
  synonym expansion) -- any one may fill the slot;
- an empty slot (``[]`` / ``[""]`` / ``None``) is a don't-care gap that
  advances the expected position by one (unless still before the first
  real match, search_phrase.go:458-464);
- the first real slot anchors anywhere; each later slot's location
  costs ``|prev_pos + 1 - pos|`` against the shared path budget
  (editDistance, search_phrase.go:501-507) -- the budget is cumulative
  across the whole path, not per-gap;
- all locations in one path must carry identical array positions
  (same element of an array field, search_phrase.go:473-476);
- one (term, location) may appear only once per path
  (search_phrase.go:485-490), so "cat dog dog" cannot satisfy
  ``"dog dog"`` twice from a single location.

The production match path keeps slop at 0 (the vectorized slot-key
intersection in searcher.PhraseSearcher); this module backs the
``slop > 0`` extension and the reference's path conformance vectors
(search_phrase_test.go TestFindPhrasePaths*).
"""

from typing import Dict, List, Optional, Sequence, Tuple

Location = dict  # {"pos": int, ... optional "array_positions": list}
PhrasePart = Tuple[str, Location]


def _ap_key(loc: Location) -> tuple:
    return tuple(loc.get("array_positions") or ())


def find_phrase_paths(
    phrase_terms: Sequence[Optional[Sequence[str]]],
    tlm: Dict[str, List[Location]],
    slop: int = 0,
) -> List[List[PhrasePart]]:
    """All phrase paths of ``phrase_terms`` over ``tlm`` within ``slop``.

    Returns a list of paths; each path is a list of (term, location)
    in slot order.  Deterministic: slots in order, candidate terms in
    slot order, locations in tlm list order (matching the reference's
    slice iteration)."""
    rv: List[List[PhrasePart]] = []

    def rec(prev_pos: int, ap: tuple, slots, path: List[PhrasePart],
            remaining: int) -> None:
        if not slots:
            rv.append(list(path))
            return
        car, cdr = slots[0], slots[1:]
        if not car or (len(car) == 1 and car[0] == ""):
            # gap: advance expected position once a real slot anchored
            rec(prev_pos + 1 if prev_pos != 0 else 0, ap, cdr, path,
                remaining)
            return
        for term in car:
            for loc in tlm.get(term, ()):
                if prev_pos != 0 and _ap_key(loc) != ap:
                    continue
                dist = 0
                if prev_pos != 0:
                    dist = abs(prev_pos + 1 - loc["pos"])
                if prev_pos == 0 or remaining - dist >= 0:
                    if any(t == term and l is loc for t, l in path):
                        continue  # location already used by this path
                    path.append((term, loc))
                    rec(loc["pos"], _ap_key(loc), cdr, path,
                        remaining - dist)
                    path.pop()

    rec(0, (), list(phrase_terms), [], slop)
    return rv
