"""View-tuple construction over pair graphs and 360 scene pools.

Parity target: reference `must3r/datasets/base/tuple_maker.py`:
  * `select_tuple_from_pairs`: BFS-grow an N-view tuple over a covisibility
    pair graph; only the first `memory_num_views` views expand the frontier
    so later (rendered-only) views always overlap a memory view.
  * `select_tuple_from_360_scene`: random valid views from a scene pool.
  * `fill_views`: pad short tuples by duplication.
"""

from __future__ import annotations

import copy
from typing import Callable, List

import numpy as np


def fill_views(views: List, num_views: int) -> List:
    if len(views) == 0:
        raise ValueError("no valid views to build a tuple from")
    while len(views) < num_views:
        views = (views + copy.deepcopy(views))[:num_views]
    return views


def select_tuple_from_pairs(pairs_getter: Callable, view_getter: Callable,
                            num_views: int, memory_num_views: int,
                            rng: np.random.Generator, idx1: int, idx2: int
                            ) -> List:
    """Grow [idx1, idx2] to num_views using the pair graph; the frontier
    only expands while the tuple is within the memory prefix."""
    selected = [idx1, idx2]
    selected_set = set(selected)
    possibilities = set(pairs_getter(idx1)) | set(pairs_getter(idx2))
    possibilities -= selected_set

    for _ in range(2, num_views):
        if not possibilities:
            break
        new_idx = rng.choice(sorted(possibilities))
        selected.append(int(new_idx))
        selected_set.add(int(new_idx))
        if len(selected) <= memory_num_views:
            possibilities |= set(pairs_getter(int(new_idx)))
        possibilities -= selected_set

    views = [view_getter(i, rng) for i in selected]
    return fill_views(views, num_views)


def select_tuple_from_360_scene(is_valid_getter: Callable,
                                is_valid_check: Callable,
                                view_getter: Callable,
                                nimg_per_scene: int, num_views: int,
                                rng: np.random.Generator, idx: int) -> List:
    """Random valid views from a scene's image pool (360-style datasets)."""
    views = []
    possibilities = set(range(nimg_per_scene))
    img_idx = idx if idx in possibilities else \
        int(rng.choice(sorted(possibilities)))
    while len(views) < num_views and img_idx is not None:
        possibilities.discard(img_idx)
        nxt = (int(rng.choice(sorted(possibilities)))
               if possibilities else None)
        if is_valid_getter(img_idx):
            view = view_getter(img_idx, rng)
            if is_valid_check(view, img_idx):
                views.append(view)
        img_idx = nxt
    return fill_views(views, num_views)
