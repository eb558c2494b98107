"""Deterministic Rick&Morty-shaped fixture payloads (FIXTURES.md §1).

Covers every edge case the reference's guards exercise: empty origin/
location urls, unparseable air_date, duplicate page overlap, attribute
mutation between runs, edges present on both sides, NULL↔value flips.
"""

from __future__ import annotations

CHAR_URL = "https://api.example.com/character/{}"
LOC_URL = "https://api.example.com/location/{}"
EP_URL = "https://api.example.com/episode/{}"


def character(i, name=None, status="Alive", species="Human", type_="",
              gender="Male", origin_id=1, origin_url=True, loc_id=1,
              loc_url=True, episodes=(1,), created="2017-11-04T18:48:46.250Z"):
    return {
        "id": i,
        "name": name or f"Char {i}",
        "status": status,
        "species": species,
        "type": type_,
        "gender": gender,
        "image": f"https://img.example.com/{i}.jpeg",
        "url": CHAR_URL.format(i),
        "created": created,
        "origin": {
            "name": f"Loc {origin_id}" if origin_url else "unknown",
            "url": LOC_URL.format(origin_id) if origin_url else "",
        },
        "location": {
            "name": f"Loc {loc_id}" if loc_url else "unknown",
            "url": LOC_URL.format(loc_id) if loc_url else "",
        },
        "episode": [EP_URL.format(e) for e in episodes],
    }


def location(i, name=None, type_="Planet", dimension="C-137",
             residents=(), created="2017-11-10T12:42:04.162Z"):
    return {
        "id": i,
        "name": name or f"Loc {i}",
        "type": type_,
        "dimension": dimension,
        "url": LOC_URL.format(i),
        "created": created,
        "residents": [CHAR_URL.format(c) for c in residents],
    }


def episode(i, name=None, code=None, air_date="December 2, 2013",
            characters=(), created="2017-11-10T12:56:33.798Z"):
    return {
        "id": i,
        "name": name or f"Ep {i}",
        "episode": code or f"S01E{i:02d}",
        "air_date": air_date,
        "url": EP_URL.format(i),
        "created": created,
        "characters": [CHAR_URL.format(c) for c in characters],
    }


def base_universe():
    """Run-1 snapshot: 5 characters, 3 locations, 3 episodes.

    - char 3 has empty origin+location urls (Unknown-member path)
    - ep 3 has air_date='unknown' (guarded parse → NULL)
    - char1↔ep1 edge present on BOTH sides (union-dedup)
    - char 2 is a resident of loc 2 AND has loc 2 as 'last' (fact dedup)
    """
    chars = [
        character(1, episodes=(1, 2), origin_id=1, loc_id=1),
        character(2, episodes=(1,), origin_id=2, loc_id=2, gender="Female"),
        character(3, origin_url=False, loc_url=False, episodes=(2,)),
        character(4, status="Dead", origin_id=1, loc_id=2, episodes=(3,)),
        character(5, species="Alien", origin_id=3, loc_id=3, episodes=(2, 3)),
    ]
    locs = [
        location(1, residents=(1,)),
        location(2, residents=(2, 4)),
        location(3, type_="Space station", residents=(5,)),
    ]
    eps = [
        episode(1, characters=(1, 2)),
        episode(2, characters=(1, 3, 5), air_date="January 10, 2014"),
        episode(3, characters=(4, 5), air_date="unknown"),
    ]
    return chars, locs, eps


def mutated_universe():
    """Run-2 snapshot: char 1 status Alive→Dead (SCD2 close+open); char 3
    type ''→'Clone' (NULL-ish flip); everything else identical."""
    chars, locs, eps = base_universe()
    chars[0] = character(1, status="Dead", episodes=(1, 2), origin_id=1, loc_id=1)
    chars[2] = character(3, type_="Clone", origin_url=False, loc_url=False,
                         episodes=(2,))
    return chars, locs, eps


def mutated_universe_2():
    """Run-3 snapshot on top of run 2: char 1 flips BACK to Alive (a
    third version of an already-twice-versioned key — the revert case),
    char 5 species Alien→Robot (first change of a so-far-stable key);
    char 3 keeps its run-2 'Clone' type."""
    chars, locs, eps = mutated_universe()
    chars[0] = character(1, status="Alive", episodes=(1, 2), origin_id=1,
                         loc_id=1)
    chars[4] = character(5, species="Robot", origin_id=3, loc_id=3,
                         episodes=(2, 3))
    return chars, locs, eps
