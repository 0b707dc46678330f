"""Per-contig checkpoint/resume for long WGS phasing runs (SURVEY.md §5).

The reference has no checkpointing — a killed multi-hour WGS `phase` run
restarts from zero. Our per-chromosome results are flat dicts
(``{"<chrom>_<pos>": (hap_string, ps)}``), so checkpointing is one small
JSON file per contig, written atomically (tmp + rename) as each contig
finishes. A fingerprint of the inputs and parameters guards against
resuming a checkpoint of a different run configuration.

Enabled with ``--checkpoint DIR`` on the phase subcommand (an extension;
no reference flag exists, Phasing.cpp:53-75 has none).
"""

from __future__ import annotations

import hashlib
import json
import os


def phase_fingerprint(cfg) -> str:
    """Identity of a phasing run: input file sizes + the full parameter
    set. Sizes (not mtimes) so copies of the same inputs resume cleanly."""

    def fsize(p):
        try:
            return os.path.getsize(p)
        except OSError:
            return -1

    parts = [
        f"snp={fsize(cfg.snp_file)}",
        "bams=" + ",".join(str(fsize(b)) for b in sorted(cfg.bam_files)),
        f"fa={fsize(cfg.fasta_file)}",
        f"sv={fsize(cfg.sv_file) if cfg.sv_file else 0}",
        f"mod={fsize(cfg.mod_file) if cfg.mod_file else 0}",
        f"indel={cfg.phase_indel}:{cfg.indel_quality}",
        f"ont={cfg.is_ont}",
        f"params={cfg.params!r}",
    ]
    return hashlib.sha256(";".join(parts).encode()).hexdigest()[:16]


def somatic_fingerprint(cfg) -> str:
    """Identity of a somatic run: both BAMs + both VCFs + every parameter
    that changes the extraction-pass output (the checkpointed stage)."""

    def fsize(p):
        try:
            return os.path.getsize(p)
        except OSError:
            return -1

    parts = [
        f"snp={fsize(cfg.snp_file)}",
        f"tum_vcf={fsize(cfg.tumor_snv_file)}",
        f"nor_bam={fsize(cfg.bam_file)}",
        f"tum_bam={fsize(cfg.tumor_bam_file)}",
        f"fa={fsize(cfg.fasta_file)}",
        f"sv={fsize(cfg.sv_file) if cfg.sv_file else 0}",
        f"mod={fsize(cfg.mod_file) if cfg.mod_file else 0}",
        f"q={cfg.quality_threshold}:p={cfg.percentage_threshold}",
        f"sup={cfg.tag_supplementary}:region={cfg.region}",
        # purity-mode extraction omits the offset windows: its checkpoints
        # must not feed a somatic_haplotag resume (which needs them)
        f"win={getattr(cfg, 'collect_offset_windows', True)}",
        f"rs={getattr(cfg, 'collect_read_sets', True)}",
    ]
    return hashlib.sha256(";".join(parts).encode()).hexdigest()[:16]


def modcall_fingerprint(cfg) -> str:
    """Identity of a modcall run: inputs + thresholds that shape the
    per-chromosome VCF body lines."""

    def fsize(p):
        try:
            return os.path.getsize(p)
        except OSError:
            return -1

    parts = [
        "bams=" + ",".join(str(fsize(b)) for b in sorted(cfg.bam_files)),
        f"fa={fsize(cfg.fasta_file)}",
        f"snp={fsize(cfg.snp_file) if cfg.snp_file else 0}",
        f"thr={cfg.mod_threshold}:{cfg.unmod_threshold}"
        f":{cfg.heter_ratio}:{cfg.noise_ratio}",
        f"adj={cfg.connect_adjacent}:{cfg.connect_confidence}",
        f"all={cfg.output_all_mod}",
    ]
    return hashlib.sha256(";".join(parts).encode()).hexdigest()[:16]


class PickleContigCheckpoint:
    """Per-(contig, stage) pickle store for object-shaped stage outputs
    (the somatic extraction passes). Files are written atomically; a
    fingerprint mismatch or unreadable file means recompute, never trust."""

    def __init__(self, directory: str, fingerprint: str, kind: str):
        self.dir = directory
        self.fingerprint = fingerprint
        self.kind = kind
        os.makedirs(directory, exist_ok=True)

    def _path(self, chrom: str, stage: str) -> str:
        safe = "".join(c if c.isalnum() or c in "._-" else "%%%02x" % ord(c)
                       for c in chrom)
        return os.path.join(self.dir, f"{safe}.{self.kind}.{stage}.pkl")

    def load(self, chrom: str, stage: str):
        """The stored payload, or None when absent/stale/corrupt."""
        import pickle

        try:
            with open(self._path(chrom, stage), "rb") as f:
                blob = pickle.load(f)
            if blob.get("fingerprint") != self.fingerprint:
                return None
            return blob["payload"]
        except Exception:  # noqa: BLE001 — any corruption -> recompute
            return None

    def save(self, chrom: str, stage: str, payload) -> None:
        import pickle

        path = self._path(chrom, stage)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"fingerprint": self.fingerprint,
                         "payload": payload}, f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)


class LinesCheckpoint:
    """Per-contig text-lines store (modcall's per-chromosome VCF body)."""

    def __init__(self, directory: str, fingerprint: str):
        self.dir = directory
        self.fingerprint = fingerprint
        os.makedirs(directory, exist_ok=True)

    def _path(self, chrom: str) -> str:
        safe = "".join(c if c.isalnum() or c in "._-" else "%%%02x" % ord(c)
                       for c in chrom)
        return os.path.join(self.dir, f"{safe}.modcall.json")

    def load(self) -> dict[str, list]:
        out: dict[str, list] = {}
        try:
            names = os.listdir(self.dir)
        except OSError:
            return out
        for name in names:
            if not name.endswith(".modcall.json"):
                continue
            try:
                with open(os.path.join(self.dir, name)) as f:
                    blob = json.load(f)
                if blob.get("fingerprint") != self.fingerprint:
                    continue
                out[blob["chrom"]] = list(blob["lines"])
            except (OSError, ValueError, KeyError):
                continue
        return out

    def save(self, chrom: str, lines: list) -> None:
        path = self._path(chrom)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fingerprint": self.fingerprint, "chrom": chrom,
                       "lines": list(lines)}, f)
        os.replace(tmp, path)


class ContigCheckpoint:
    """Per-contig result store under one directory."""

    def __init__(self, directory: str, fingerprint: str):
        self.dir = directory
        self.fingerprint = fingerprint
        os.makedirs(directory, exist_ok=True)

    def _path(self, chrom: str) -> str:
        safe = "".join(c if c.isalnum() or c in "._-" else "%%%02x" % ord(c)
                       for c in chrom)
        return os.path.join(self.dir, f"{safe}.phase.json")

    def load(self) -> dict[str, dict]:
        """All stored contig results whose fingerprint matches. Stale or
        corrupt files are ignored (recomputed), never trusted."""
        out: dict[str, dict] = {}
        try:
            names = os.listdir(self.dir)
        except OSError:
            return out
        for name in names:
            if not name.endswith(".phase.json"):
                continue
            try:
                with open(os.path.join(self.dir, name)) as f:
                    blob = json.load(f)
                if blob.get("fingerprint") != self.fingerprint:
                    continue
                out[blob["chrom"]] = {
                    k: (v[0], int(v[1]))
                    for k, v in blob["result"].items()}
            except (OSError, ValueError, KeyError, IndexError):
                continue
        return out

    def save(self, chrom: str, result: dict) -> None:
        path = self._path(chrom)
        tmp = path + ".tmp"
        blob = {"fingerprint": self.fingerprint, "chrom": chrom,
                "result": {k: [v[0], v[1]] for k, v in result.items()}}
        with open(tmp, "w") as f:
            json.dump(blob, f)
        os.replace(tmp, path)
