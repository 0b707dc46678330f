from .fasta import FastaFile
from .bgzf import BgzfReader, BgzfWriter, is_bgzf
from .bam import BamReader, BamWriter, BamRecord
from .cram import CramReader, CramWriter, is_cram, open_alignment
from . import vcf
