"""Oracle tests for the LVIS AP and panoptic-quality evaluators.

Every expected value below is computed by hand from the published metric
definitions (LVIS CVPR'19 protocol; panopticapi pq_compute semantics —
see data/lvis_panoptic.py docstring for the rules being exercised).
"""

import numpy as np
import pytest

from spacecraft_pose_estimation_tpu.data.lvis_panoptic import (
    evaluate_lvis,
    evaluate_panoptic,
    lvis_frequency_bins,
)


def _box(x, y, w, h):
    return [x, y, x + w, y + h]


class TestLVIS:
    @pytest.mark.smoke
    def test_perfect_single_category(self):
        dets = [{"boxes": [_box(0, 0, 50, 50)], "scores": [0.9], "classes": [1]}]
        gts = [{"boxes": [_box(0, 0, 50, 50)], "classes": [1]}]
        res = evaluate_lvis(dets, gts)
        assert res["AP"] == pytest.approx(100.0)
        assert res["AP50"] == pytest.approx(100.0)

    def test_not_exhaustive_ignore_rule(self):
        """A detection of category 2 on an image where 2 is neither
        annotated nor verified-absent must be IGNORED — the category's AP
        stays perfect. The identical setup with neg_classes=[2] makes it
        a false positive and halves the 101-point precision envelope."""
        dets = [
            {"boxes": [_box(0, 0, 50, 50)], "scores": [0.9], "classes": [2]},
            {
                "boxes": [_box(0, 0, 50, 50), _box(60, 60, 20, 20)],
                "scores": [0.8, 0.7],
                "classes": [2, 2],
            },
        ]
        # image 0 has no cat-2 annotation and no neg flag -> ignored
        gts = [
            {"boxes": [_box(0, 0, 40, 40)], "classes": [7]},
            {"boxes": [_box(0, 0, 50, 50)], "classes": [2]},
        ]
        res = evaluate_lvis(dets, gts)
        # cat 7: no dets -> AP 0; cat 2: single TP (the 0.8 det), the
        # 0.7 det is an FP on an exhaustive image BUT ranks below the TP
        # so precision at recall 1.0 stays 1.0 -> AP(cat2) = 100.
        assert res["AP"] == pytest.approx(50.0)

        gts[0]["neg_classes"] = [2]
        res2 = evaluate_lvis(dets, gts)
        # now the 0.9 det is an FP ABOVE the TP: precision at the single
        # recall point = 1/2 -> AP(cat2) = 50, mean with cat7 (0) = 25.
        assert res2["AP"] == pytest.approx(25.0)

    def test_max_dets_cap_across_categories(self):
        # two dets, cap 1: only the higher-scoring (wrong-box) det stays
        dets = [
            {
                "boxes": [_box(100, 100, 10, 10), _box(0, 0, 50, 50)],
                "scores": [0.9, 0.8],
                "classes": [1, 1],
            }
        ]
        gts = [{"boxes": [_box(0, 0, 50, 50)], "classes": [1]}]
        res = evaluate_lvis(dets, gts, max_dets=1)
        assert res["AP"] == pytest.approx(0.0)
        res_full = evaluate_lvis(dets, gts, max_dets=300)
        # TP ranks second behind an FP: precision@recall1 = 1/2
        assert res_full["AP"] == pytest.approx(50.0)

    def test_frequency_bins(self):
        counts = {1: 5, 2: 50, 3: 500}
        assert lvis_frequency_bins(counts) == {1: "r", 2: "c", 3: "f"}
        dets = [
            {
                "boxes": [_box(0, 0, 50, 50), _box(60, 0, 50, 50)],
                "scores": [0.9, 0.9],
                "classes": [1, 2],
            }
        ]
        gts = [
            {
                "boxes": [_box(0, 0, 50, 50), _box(60, 0, 50, 50), _box(0, 60, 50, 50)],
                "classes": [1, 2, 3],
            }
        ]
        res = evaluate_lvis(dets, gts, category_image_counts=counts)
        assert res["APr"] == pytest.approx(100.0)  # cat 1 perfect
        assert res["APc"] == pytest.approx(100.0)  # cat 2 perfect
        assert res["APf"] == pytest.approx(0.0)  # cat 3 missed
        assert res["AP"] == pytest.approx(200.0 / 3)


class TestPanoptic:
    def _image(self, assignments, shape=(10, 10)):
        m = np.zeros(shape, np.int32)
        for sid, (r0, r1, c0, c1) in assignments.items():
            m[r0:r1, c0:c1] = sid
        return m

    @pytest.mark.smoke
    def test_perfect(self):
        m = self._image({1: (0, 5, 0, 10), 2: (5, 10, 0, 10)})
        segs = [{"id": 1, "category": 10}, {"id": 2, "category": 20}]
        res = evaluate_panoptic([(m, segs)], [(m, segs)])
        assert res["PQ"] == pytest.approx(100.0)
        assert res["SQ"] == pytest.approx(100.0)
        assert res["RQ"] == pytest.approx(100.0)
        assert res["N"] == 2

    def test_partial_overlap_pq(self):
        """GT segment rows 0..6 (60 px), pred rows 0..5 (50 px), rest
        void in both: IoU = 50/60. One TP, no FP/FN:
        PQ = SQ = 50/60, RQ = 1."""
        gt = self._image({1: (0, 6, 0, 10)})
        pred = self._image({4: (0, 5, 0, 10)})
        res = evaluate_panoptic(
            [(pred, [{"id": 4, "category": 3}])],
            [(gt, [{"id": 1, "category": 3}])],
        )
        assert res["PQ"] == pytest.approx(100 * 50 / 60)
        assert res["SQ"] == pytest.approx(100 * 50 / 60)
        assert res["RQ"] == pytest.approx(100.0)

    def test_void_excluded_from_union(self):
        """Pred covers the whole image; GT labels half, half void. The
        pred's void overlap leaves the union: IoU = 50/(50+100-50-50)=1."""
        gt = self._image({1: (0, 5, 0, 10)})
        pred = self._image({9: (0, 10, 0, 10)})
        res = evaluate_panoptic(
            [(pred, [{"id": 9, "category": 3}])],
            [(gt, [{"id": 1, "category": 3}])],
        )
        assert res["PQ"] == pytest.approx(100.0)

    def test_category_mismatch_is_fp_and_fn(self):
        m = self._image({1: (0, 10, 0, 10)})
        res = evaluate_panoptic(
            [(m, [{"id": 1, "category": 5}])],
            [(m, [{"id": 1, "category": 6}])],
        )
        # cat 6: FN; cat 5: FP. PQ per class = 0, mean = 0, N = 2.
        assert res["PQ"] == pytest.approx(0.0)
        assert res["N"] == 2

    def test_mostly_void_pred_not_fp(self):
        """Unmatched pred with 60% void overlap is excused; with only
        40% it counts as FP."""
        gt = self._image({1: (0, 4, 0, 10)})  # rows 0..4 cat 3, rest void
        pred_mostly_void = self._image({2: (0, 10, 0, 10)})  # 60% void
        res = evaluate_panoptic(
            [(pred_mostly_void, [{"id": 2, "category": 4}])],
            [(gt, [{"id": 1, "category": 3}])],
        )
        # cat 3: one FN -> PQ 0 with N=1; cat 4 pred excused (not FP)
        assert res["N"] == 1
        assert res["PQ"] == pytest.approx(0.0)

        pred_less_void = self._image({2: (0, 6, 0, 10)})  # void rows 4..6 = 33%
        res2 = evaluate_panoptic(
            [(pred_less_void, [{"id": 2, "category": 4}])],
            [(gt, [{"id": 1, "category": 3}])],
        )
        assert res2["N"] == 2  # cat 4 now carries an FP

    def test_crowd_semantics(self):
        """Crowd GT: never matched, not FN; same-class crowd overlap
        excuses an unmatched pred."""
        gt = self._image({1: (0, 10, 0, 10)})
        gt_segs = [{"id": 1, "category": 3, "iscrowd": 1}]
        pred = self._image({2: (0, 10, 0, 10)})
        res = evaluate_panoptic(
            [(pred, [{"id": 2, "category": 3}])], [(gt, gt_segs)]
        )
        # crowd gt -> no FN; pred fully covered by same-class crowd -> no FP
        assert res["N"] == 0
        assert np.isnan(res["PQ"])

    def test_thing_stuff_split(self):
        m1 = self._image({1: (0, 5, 0, 10), 2: (5, 10, 0, 10)})
        segs = [{"id": 1, "category": 1}, {"id": 2, "category": 2}]
        pred = self._image({1: (0, 5, 0, 10)})  # only the thing segment
        res = evaluate_panoptic(
            [(pred, [{"id": 1, "category": 1}])],
            [(m1, segs)],
            thing_categories={1},
        )
        assert res["PQ_th"] == pytest.approx(100.0)
        assert res["PQ_st"] == pytest.approx(0.0)  # stuff cat 2 missed
        assert res["PQ"] == pytest.approx(50.0)
