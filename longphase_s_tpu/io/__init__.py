from .fasta import FastaFile
from .bgzf import BgzfReader, BgzfWriter, is_bgzf
from .bam import BamReader, BamWriter, BamRecord
from . import vcf
