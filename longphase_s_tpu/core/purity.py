"""Tumor purity estimation (TumorPurityEstimator.{h,cpp}).

Pipeline: LCVF filters -> bimodal-valley histogram threshold (Gaussian
smoothing, peak/trend analysis, lowest-valley selection) -> box-plot outlier
removal -> quadratic regression on (median, IQR) of the germline read-HP
imbalance ratio.
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass, field

from .somatic_types import RH_H1, RH_H2

# LCVF constants (TumorPurityEstimator.h:280-284)
IMBALANCE_MIN = 0.0
IMBALANCE_NOR_MIN = 0.0
IMBALANCE_NOR_MAX = 0.7
PCT_GERMLINE_NOR_MAX = 0.7
READ_COUNT_NOR_MIN = 5
THRESHOLD_PERCENTAGE_LIMIT = 0.3


@dataclass
class PurityPoint:
    chrom: str
    pos: int
    imbalance: float          # germlineReadHpImbalanceRatio (tumor bam)
    read_count_nor: int       # germlineReadHpCountInNorBam


@dataclass
class FilterCounts:
    imbalance_nor: int = 0
    imbalance: int = 0
    imbalance_nor_max: int = 0
    read_count_nor: int = 0
    pct_germline: int = 0
    peak_valley: int = 0
    outliers: int = 0


@dataclass
class BoxPlot:
    data_size: int = 0
    q1: float = 0.0
    median: float = 0.0
    q3: float = 0.0
    iqr: float = 0.0
    lower: float = 0.0
    upper: float = 0.0
    outliers: int = 0


@dataclass
class Peak:
    index: int = 0
    height: float = 0.0
    left_trend: str = "NONE"
    right_trend: str = "NONE"
    is_main: bool = False


class PurityEstimator:
    def __init__(self, chr_vec, nor_base_by_chr, somatic_info_by_chr,
                 write_log=False, result_prefix=""):
        self.chr_vec = chr_vec
        self.nor_base = nor_base_by_chr          # chr -> {pos: PosBase}
        self.somatic_info = somatic_info_by_chr  # chr -> {pos: SomaticData}
        self.write_log = write_log
        self.result_prefix = result_prefix
        self.counts = FilterCounts()
        self.initial_data_size = 0
        self.flags: dict[tuple[str, int], bool] = {}
        self.threshold = 0
        self.plot = BoxPlot()

    # ------------------------------------------------------------------
    def estimate(self) -> float:
        print("estimating tumor purity ... ", end="", file=sys.stderr)
        try:
            points = self.build_points()
            self.threshold = self.find_bimodal_valley_threshold(points)
            points = self.bimodal_valley_filter(points, self.threshold)
            plot = self.statistic(points)
            for _ in range(1):
                points = self.remove_outliers(points, plot)
                plot = self.statistic(points)
            self.plot = plot
            median, iqr = plot.median, plot.iqr
            purity = (-3.3454 * median + 14.7747 * iqr + 4.0344 * median * median
                      - 13.7777 * median * iqr - 5.2434 * iqr * iqr + 0.3058)
            if purity > 1.0:
                purity = 1.0
            elif purity < 0.0:
                raise RuntimeError(
                    "The value of purity exceeds the model's estimation range")
            print("", file=sys.stderr)
            self.write_result(purity, plot)
            return purity
        except Exception as e:  # noqa: BLE001 — degrade to 0.0 like the reference
            print(f"[ERROR] {e}", file=sys.stderr)
            print("[ERROR] Failed to estimate tumor purity, set purity to 0.0",
                  file=sys.stderr)
            return 0.0

    def build_points(self) -> list[PurityPoint]:
        """buildPurityFeatureValueVec (TumorPurityEstimator.cpp:92-149)."""
        out = []
        for chrom in self.chr_vec:
            for pos, sd in sorted(self.somatic_info.get(chrom, {}).items()):
                self.initial_data_size += 1
                imb = sd.base.germline_hp_imbalance
                nb = self.nor_base.get(chrom, {}).get(pos)
                h1 = nb.read_hp_count.get(RH_H1, 0) if nb else 0
                h2 = nb.read_hp_count.get(RH_H2, 0) if nb else 0
                nor_count = h1 + h2
                nor_imb = nb.germline_hp_imbalance if nb else 0.0
                nor_pct = nb.pct_germline_hp if nb else 0.0
                if nor_imb == IMBALANCE_NOR_MIN:
                    self.counts.imbalance_nor += 1
                elif imb == IMBALANCE_MIN:
                    self.counts.imbalance += 1
                elif nor_imb >= IMBALANCE_NOR_MAX:
                    self.counts.imbalance_nor_max += 1
                elif nor_count <= READ_COUNT_NOR_MIN:
                    self.counts.read_count_nor += 1
                elif nor_pct <= PCT_GERMLINE_NOR_MAX:
                    self.counts.pct_germline += 1
                else:
                    out.append(PurityPoint(chrom, pos, imb, nor_count))
                    self.flags[(chrom, pos)] = True
        if not out:
            raise RuntimeError("Failed to build purity feature vector: empty vector")
        return out

    # -- histogram / peaks ---------------------------------------------
    def find_bimodal_valley_threshold(self, points) -> int:
        """findBimodalValleyThreshold (TumorPurityEstimator.cpp:158-226)."""
        try:
            counts, pct, max_h, _rng = _build_histogram([p.read_count_nor
                                                         for p in points])
            s_counts = _gaussian_smooth(counts, 0.5)
            s_counts, s_pct, s_max, _ = _histogram_stats(s_counts, len(points))
            # reference quirk: the smoothed copy keeps the pre-smoothing
            # max_height member (calculateStatistics only raises it), so the
            # original maximum governs both thresholds
            s_max = max(s_max, max_h)
            peak_thr = max(int(s_max * 0.05), 1)
            peaks = _find_peaks(s_counts, peak_thr)
            peaks = _remove_close_peaks(peaks, 2)
            _determine_trends(peaks)
            _find_main_peaks(peaks)
            return _set_threshold_by_valley(peaks, s_counts, s_pct, s_max)
        except Exception as e:  # noqa: BLE001
            print(f"[ERROR] {e}", file=sys.stderr)
            print("[ERROR] Failed to find peak valley threshold, set threshold "
                  "to 0", file=sys.stderr)
            return 0

    def bimodal_valley_filter(self, points, threshold):
        """bimodalValleyFilter (TumorPurityEstimator.cpp:235-247)."""
        kept = []
        for p in points:
            if p.read_count_nor < threshold:
                self.counts.peak_valley += 1
                self.flags[(p.chrom, p.pos)] = False
            else:
                kept.append(p)
        return kept

    def remove_outliers(self, points, plot):
        """removeOutliers (TumorPurityEstimator.cpp:256-272)."""
        kept = []
        for p in points:
            if p.imbalance < plot.lower or p.imbalance > plot.upper:
                self.flags[(p.chrom, p.pos)] = False
                self.counts.outliers += 1
            else:
                kept.append(p)
        return kept

    def statistic(self, points) -> BoxPlot:
        """statisticPurityData (TumorPurityEstimator.cpp:281-344)."""
        plot = BoxPlot()
        plot.data_size = len(points)
        if plot.data_size == 0:
            raise RuntimeError("the data size is 0")
        values = sorted(p.imbalance for p in points)

        def percentile(p):
            pos = p * (plot.data_size - 1)
            idx = int(pos)
            frac = pos - idx
            if idx + 1 >= plot.data_size:
                return values[-1]
            return values[idx] * (1.0 - frac) + values[idx + 1] * frac

        plot.q1 = percentile(0.25)
        plot.median = percentile(0.5)
        plot.q3 = percentile(0.75)
        plot.iqr = plot.q3 - plot.q1
        plot.lower = max(0.0, plot.q1 - 1.5 * plot.iqr)
        plot.upper = plot.q3 + 1.5 * plot.iqr
        plot.outliers = sum(1 for v in values if v < plot.lower or v > plot.upper)
        return plot

    def mark_statistic_flag(self):
        """markStatisticFlag (TumorPurityEstimator.cpp:352-364)."""
        for (chrom, pos), flag in self.flags.items():
            sd = self.somatic_info.get(chrom, {}).get(pos)
            if sd is not None:
                sd.statistic_purity = flag

    def write_result(self, purity, plot):
        """writePurityResult (TumorPurityEstimator.cpp:375-424)."""
        if not self.result_prefix:
            return
        path = self.result_prefix + "_purity.out"
        with open(path, "w") as f:
            f.write("#==================================\n")
            f.write("# TUMOR PURITY ESTIMATION REPORT\n")
            f.write("#==================================\n")
            f.write(f"#Initial data size: {self.initial_data_size}\n")
            f.write("#==========filter parameters==========\n")
            f.write(f"#GERMLINE_HP_IMBALANCE_RATIO_MIN_THR: {IMBALANCE_MIN:g}\n")
            f.write(f"#GERMLINE_HP_IMBALANCE_RATIO_IN_NOR_BAM_MIN_THR: {IMBALANCE_NOR_MIN:g}\n")
            f.write(f"#GERMLINE_HP_IMBALANCE_RATIO_IN_NOR_BAM_MAX_THR: {IMBALANCE_NOR_MAX:g}\n")
            f.write(f"#GERMLINE_HP_PERCENTAGE_IN_NOR_BAM_MAX_THR: {PCT_GERMLINE_NOR_MAX:g}\n")
            f.write(f"#GERMLINE_HP_READ_COUNT_IN_NOR_BAM_MIN_THR: {READ_COUNT_NOR_MIN}\n")
            f.write(f"#GERMLINE_HP_READ_COUNT_IN_NOR_BAM_DYNAMIC_THR: {self.threshold}\n")
            f.write("#==========Initial filter out data count==========\n")
            f.write(f"#imbalanceRatioInNorBam: {self.counts.imbalance_nor}\n")
            f.write(f"#imbalanceRatio: {self.counts.imbalance}\n")
            f.write(f"#imbalanceRatioInNorBam_over_thr: {self.counts.imbalance_nor_max}\n")
            f.write(f"#readHpCountInNorBam: {self.counts.read_count_nor}\n")
            f.write(f"#percentageOfGermlineHpInNorBam: {self.counts.pct_germline}\n")
            f.write("#==========Second filter out data count==========\n")
            f.write(f"#peakValley count: {self.counts.peak_valley}\n")
            f.write("#==========Whisker filter out data count==========\n")
            f.write("#iteration times: 1\n")
            f.write(f"#remove outliers: {self.counts.outliers}\n")
            f.write("#==========Statistical analysis===========\n")
            f.write(f"Data size: {plot.data_size}\n")
            f.write(f"Median: {_fmt(plot.median)}\n")
            f.write(f"Q1: {_fmt(plot.q1)}\n")
            f.write(f"Q3: {_fmt(plot.q3)}\n")
            f.write(f"IQR: {_fmt(plot.iqr)}\n")
            f.write(f"Whiskers: {_fmt(plot.lower)} to {_fmt(plot.upper)}\n")
            f.write(f"Outliers: {plot.outliers}\n")
            f.write("#==========Estimation result===========\n")
            f.write(f"Tumor purity: {_fmt(purity)}\n")


def _fmt(x: float) -> str:
    """C++ default ostream double formatting (6 significant digits)."""
    return f"{x:.6g}"


# ---------------------------------------------------------------------------
# histogram helpers (Histogram / PeakProcessor, TumorPurityEstimator.cpp:426-1031)
# ---------------------------------------------------------------------------

def _build_histogram(read_counts):
    size = 1000
    mx = max(read_counts)
    while mx >= size:
        size *= 2
        if size >= 1000000:
            raise OverflowError("Read count exceeds maximum histogram size")
    counts = [0.0] * size
    for rc in read_counts:
        counts[rc] += 1
    return _histogram_stats(counts, len(read_counts))


def _histogram_stats(counts, total):
    """Histogram::calculateStatistics (TumorPurityEstimator.cpp:478-516)."""
    pct = [0.0] * len(counts)
    total_pct = 0.0
    max_h = 0.0
    first = 0
    last = 0
    loaded_first = False
    for i, c in enumerate(counts):
        total_pct += c / total
        pct[i] = total_pct
        if c > max_h:
            max_h = c
        if not loaded_first and c > 0:
            first = i
            loaded_first = True
        if c > 0:
            last = i
    if max_h == 0:
        raise RuntimeError("max_height is 0 in histogram")
    counts = counts[:last + 1]
    pct = pct[:last + 1]
    return counts, pct, max_h, (first, last)


def _gaussian_smooth(counts, sigma):
    """Histogram::applyGaussianFilter (TumorPurityEstimator.cpp:524-569)."""
    ks = int(6 * sigma + 1)
    if ks % 2 == 0:
        ks += 1
    half = ks // 2
    kernel = [math.exp(-0.5 * ((i - half) / sigma) ** 2) for i in range(ks)]
    s = sum(kernel)
    kernel = [k / s for k in kernel]
    out = []
    n = len(counts)
    for i in range(n):
        v = 0.0
        for j in range(ks):
            if i + j >= half:
                idx = i + j - half
                if idx >= n:
                    idx = n - 1
            else:
                idx = 0
            v += counts[idx] * kernel[j]
        out.append(v)
    return out


def _find_peaks(counts, min_height):
    """PeakProcessor::findPeaks (TumorPurityEstimator.cpp:649-690)."""
    peaks = []
    n = len(counts)
    for i in range(n):
        if counts[i] < min_height:
            continue
        is_peak = False
        if i == 0 and i != n - 1:
            is_peak = counts[i] > counts[i + 1]
        elif i == n - 1 and i != 0:
            is_peak = counts[i] > counts[i - 1]
        elif 0 < i < n - 1:
            is_peak = counts[i] > counts[i - 1] and counts[i] > counts[i + 1]
        if is_peak:
            peaks.append(Peak(i, counts[i]))
    return peaks


def _remove_close_peaks(peaks, min_distance):
    """removeClosePeaks (TumorPurityEstimator.cpp:698-721)."""
    if not peaks:
        raise RuntimeError("No peaks found in peaksVec")
    i = 0
    while i < len(peaks) - 1:
        if peaks[i + 1].index - peaks[i].index < min_distance:
            if peaks[i].height >= peaks[i + 1].height:
                del peaks[i + 1]
            else:
                del peaks[i]
        else:
            i += 1
    return peaks


def _determine_trends(peaks):
    """determineTrends (TumorPurityEstimator.cpp:728-751)."""
    for i in range(len(peaks) - 1):
        if peaks[i].height < peaks[i + 1].height:
            peaks[i].right_trend = "UP"
            peaks[i + 1].left_trend = "UP"
        elif peaks[i].height > peaks[i + 1].height:
            peaks[i].right_trend = "DOWN"
            peaks[i + 1].left_trend = "DOWN"
        else:
            peaks[i].right_trend = "FLAG"
            peaks[i + 1].left_trend = "FLAG"


def _find_main_peaks(peaks):
    """findMainPeakCandidates (TumorPurityEstimator.cpp:758-793)."""
    if len(peaks) == 1:
        peaks[0].is_main = True
        return
    for i, p in enumerate(peaks):
        if i == 0:
            p.is_main = p.right_trend == "DOWN"
        elif i == len(peaks) - 1:
            p.is_main = p.left_trend == "UP"
        else:
            p.is_main = p.left_trend == "UP" and p.right_trend == "DOWN"


def _find_lowest_valley(counts, pct, start, end):
    """findLowestValley (TumorPurityEstimator.cpp:911-935)."""
    if start >= end or end > len(counts):
        return None
    best = None
    for i in range(start + 1, end - 1):
        if counts[i] < counts[i - 1] and counts[i] < counts[i + 1]:
            if best is None or counts[i] < best[1]:
                best = (i, counts[i], pct[i])
    return best


def _set_threshold_by_valley(peaks, counts, pct, max_height):
    """setThresholdByValley (TumorPurityEstimator.cpp:944-1031)."""
    threshold = 0
    threshold_pct = 0.0
    valley = None

    main = [p for p in peaks if p.is_main]
    if not main:
        raise RuntimeError("No main peaks found in peaksVec")
    if len(main) == 1:
        main_idx = main[0].index
    else:
        by_height = sorted(main, key=lambda p: -p.height)
        main_idx = max(by_height[0].index, by_height[1].index)

    # secondary peak (findSecondaryPeak, TumorPurityEstimator.cpp:850-899)
    sec_idx = None
    if peaks[0].index == main_idx:
        sec_idx = -1
    else:
        pi = 0
        while peaks[pi].index != main_idx:
            pi += 1
        pi -= 1
        if pi == 0:
            sec_idx = peaks[0].index
        else:
            found = False
            while pi > 0:
                if peaks[pi].left_trend == "DOWN" and peaks[pi].right_trend == "UP":
                    sec_idx = peaks[pi].index
                    found = True
                    break
                pi -= 1
            if not found:
                sec_idx = peaks[0].index

    if sec_idx is not None and sec_idx != -1:
        sec_i = next(i for i, p in enumerate(peaks) if p.index == sec_idx)
        next_peak = peaks[sec_i + 1] if sec_i + 1 < len(peaks) else None
        found_valley = False
        if next_peak is not None:
            valley = _find_lowest_valley(counts, pct, sec_idx, next_peak.index)
            if valley is not None:
                threshold = valley[0]
                threshold_pct = valley[2]
                found_valley = True
        if threshold_pct >= THRESHOLD_PERCENTAGE_LIMIT or not found_valley:
            valley = None
            threshold = 0
            threshold_pct = 0.0
            if peaks[0].index != sec_idx and sec_i - 1 >= 0:
                pre_peak = peaks[sec_i - 1]
                valley = _find_lowest_valley(counts, pct, pre_peak.index, sec_idx)
                if valley is not None:
                    threshold = valley[0]
                    threshold_pct = valley[2]

    if valley is not None and valley[1] > max_height * 0.7:
        threshold = 0
        threshold_pct = 0.0
    if threshold_pct >= THRESHOLD_PERCENTAGE_LIMIT:
        threshold = 0
        threshold_pct = 0.0
    return threshold
