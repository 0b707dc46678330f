/* BAM -> CRAM converter built against the reference oracle's htslib
 * (.refbuild/htslib), used by the tests to produce genuine htslib-written
 * CRAM 3.1 files (rANS Nx16 / tok3 coded) for interop coverage that the
 * reference binary's own CLI cannot emit (it has no CRAM version option).
 *
 * Usage: bam2cram31 in.bam ref.fa out.cram [3.0|3.1]
 * Build: tools/build_bam2cram31.sh
 */
#include <stdio.h>

#include "htslib/hts.h"
#include "htslib/sam.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s in.bam ref.fa out.cram [version]\n", argv[0]);
    return 2;
  }
  htsFile* in = hts_open(argv[1], "r");
  if (!in) return 1;
  htsFile* out = hts_open(argv[3], "wc");
  if (!out) return 1;
  const char* ver = argc > 4 ? argv[4] : "3.1";
  if (hts_set_opt(out, CRAM_OPT_VERSION, ver) < 0) return 1;
  if (hts_set_opt(out, CRAM_OPT_REFERENCE, argv[2]) < 0) return 1;
  sam_hdr_t* h = sam_hdr_read(in);
  if (!h || sam_hdr_write(out, h) < 0) return 1;
  bam1_t* b = bam_init1();
  int r;
  while ((r = sam_read1(in, h, b)) >= 0)
    if (sam_write1(out, h, b) < 0) return 1;
  bam_destroy1(b);
  sam_hdr_destroy(h);
  if (hts_close(out) < 0) return 1;
  hts_close(in);
  if (r < -1) return 1;
  return sam_index_build(argv[3], 0) < 0 ? 1 : 0;  /* .crai companion */
}
