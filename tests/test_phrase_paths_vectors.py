"""Reference phrase-path conformance vectors, hand-ported from
search/searcher/search_phrase_test.go:
TestFindPhrasePaths (240-404), TestFindPhrasePathsSloppy (405-643),
TestFindPhrasePathsSloppyPalyndrome (644-723),
TestFindMultiPhrasePaths (725-818).

Expected paths compare ordered (the reference uses reflect.DeepEqual
against slice-ordered results) on (term, pos) pairs."""

import pytest

from bleve_ray.search.phrase_paths import find_phrase_paths


def L(*positions):
    return [{"pos": p} for p in positions]


def paths_to_pairs(paths):
    return [[(t, loc["pos"]) for t, loc in p] for p in paths]


# --- TestFindPhrasePaths (slop 0) ---------------------------------------

FIND_CASES = [
    # (phrase, tlm, expected-paths)
    ([["cat"], ["dog"]], {"cat": L(1), "dog": L(2)},
     [[("cat", 1), ("dog", 2)]]),
    ([["cat"], ["dog"]], {"cat": L(1)}, []),
    ([["cat"], ["dog"]], {"cat": L(1), "dog": L(3)}, []),
    ([["cat"], ["dog"]], {"cat": L(1, 8), "dog": L(2, 9)},
     [[("cat", 1), ("dog", 2)], [("cat", 8), ("dog", 9)]]),
    ([["cat"], [""], ["dog"]], {"cat": L(1), "dog": L(3)},
     [[("cat", 1), ("dog", 3)]]),
    ([[""], ["cat"], ["dog"]], {"cat": L(2), "dog": L(3)},
     [[("cat", 2), ("dog", 3)]]),
    ([["cat"], ["dog"], [""]], {"cat": L(2), "dog": L(3)},
     [[("cat", 2), ("dog", 3)]]),
]


@pytest.mark.parametrize("phrase,tlm,want", FIND_CASES)
def test_find_phrase_paths(phrase, tlm, want):
    assert paths_to_pairs(find_phrase_paths(phrase, tlm, 0)) == want


# --- TestFindPhrasePathsSloppy ------------------------------------------

SLOPPY_TLM = {"one": L(1), "two": L(2), "three": L(3), "four": L(4),
              "five": L(5)}

SLOPPY_CASES = [
    # (phrase, slop, expected, tlm-override)
    ([["one"], ["five"]], 2, [], None),
    ([["one"], ["five"]], 3, [[("one", 1), ("five", 5)]], None),
    ([["four"], ["five"]], 0, [[("four", 4), ("five", 5)]], None),
    ([["two"], ["one"]], 0, [], None),
    ([["one"], ["two"]], 1, [[("one", 1), ("two", 2)]], None),
    ([["two"], ["one"]], 1, [], None),
    ([["two"], ["one"]], 2, [[("two", 2), ("one", 1)]], None),
    ([["three"], ["one"]], 2, [], None),
    # slop is cumulative across the path
    ([["one"], ["three"], ["five"]], 2,
     [[("one", 1), ("three", 3), ("five", 5)]], None),
    ([["five"], ["three"], ["one"]], 5, [], None),
    ([["five"], ["three"], ["one"]], 6,
     [[("five", 5), ("three", 3), ("one", 1)]], None),
    # append-related edge case: ark bat cat dog dog
    ([["ark"], ["bat"], ["cat"], ["dog"]], 1,
     [[("ark", 1), ("bat", 2), ("cat", 3), ("dog", 4)],
      [("ark", 1), ("bat", 2), ("cat", 3), ("dog", 5)]],
     {"ark": L(1), "bat": L(2), "cat": L(3), "dog": L(4, 5)}),
    # a (term, location) may be used once per path: cat dog dog
    ([["cat"], ["dog"], ["dog"]], 1,
     [[("cat", 1), ("dog", 2), ("dog", 3)]],
     {"cat": L(1), "dog": L(2, 3)}),
    # cat dog cat dog with wide slop
    ([["cat"], ["dog"]], 10,
     [[("cat", 1), ("dog", 2)], [("cat", 1), ("dog", 4)],
      [("cat", 3), ("dog", 2)], [("cat", 3), ("dog", 4)]],
     {"cat": L(1, 3), "dog": L(2, 4)}),
]


@pytest.mark.parametrize("phrase,slop,want,tlm", SLOPPY_CASES)
def test_find_phrase_paths_sloppy(phrase, slop, want, tlm):
    got = find_phrase_paths(phrase, tlm or SLOPPY_TLM, slop)
    assert paths_to_pairs(got) == want


# --- TestFindPhrasePathsSloppyPalyndrome --------------------------------

PALY_TLM = {"one": L(1, 5), "two": L(2, 4), "three": L(3)}

PALY_CASES = [
    ([["two"], ["three"]], 0, [[("two", 2), ("three", 3)]]),
    ([["two"], ["three"]], 2,
     [[("two", 2), ("three", 3)], [("two", 4), ("three", 3)]]),
    ([["three"], ["two"]], 2,
     [[("three", 3), ("two", 2)], [("three", 3), ("two", 4)]]),
]


@pytest.mark.parametrize("phrase,slop,want", PALY_CASES)
def test_find_phrase_paths_palindrome(phrase, slop, want):
    assert paths_to_pairs(find_phrase_paths(phrase, PALY_TLM, slop)) == want


# --- TestFindMultiPhrasePaths -------------------------------------------

MULTI_TLM = {"cat": L(1), "dog": L(2), "frog": L(3)}

MULTI_CASES = [
    ([["cat", "rat"], ["dog"]], [[("cat", 1), ("dog", 2)]]),
    ([["cat", "rat"], ["chicken"]], []),
    ([["cat", "rat"], ["frog"]], []),
    ([["cat", "dog"], ["dog", "frog"]],
     [[("cat", 1), ("dog", 2)], [("dog", 2), ("frog", 3)]]),
    ([["cat", "rat"], [""], ["frog"]], [[("cat", 1), ("frog", 3)]]),
    ([["cat", "rat"], [], ["frog"]], [[("cat", 1), ("frog", 3)]]),
    ([["cat", "rat"], None, ["frog"]], [[("cat", 1), ("frog", 3)]]),
]


@pytest.mark.parametrize("phrase,want", MULTI_CASES)
def test_find_multi_phrase_paths(phrase, want):
    assert paths_to_pairs(find_phrase_paths(phrase, MULTI_TLM, 0)) == want


# --- array-position scoping (search_phrase.go:473-476) ------------------

def test_paths_scoped_to_one_array_element():
    tlm = {
        "cat": [{"pos": 1, "array_positions": [0]},
                {"pos": 1, "array_positions": [1]}],
        "dog": [{"pos": 2, "array_positions": [1]}],
    }
    got = find_phrase_paths([["cat"], ["dog"]], tlm, 0)
    assert paths_to_pairs(got) == [[("cat", 1), ("dog", 2)]]
    # and the surviving path is entirely element 1
    assert all(loc["array_positions"] == [1] for _, loc in got[0])
