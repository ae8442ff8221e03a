/* Test-owned harness: drives the reference's rna_seq spliced-alignment
 * prototype (rnaseqtest.c, compiled with -Dmain=ref_rnaseq_main).
 * Usage: rnaseq_main seqfile readfile
 * rna_seq() printf's "%d " itself; we add a newline per read.  Its
 * debug chatter ("Should be right?" on stdout, "%d" lines on stderr)
 * is left as-is; callers filter non-numeric stdout tokens.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "seqindex.h"

void rna_seq(const fm_index *fmi, const char *pattern, int len);

int main(int argc, char **argv) {
  if (argc < 3) return 2;
  FILE *fp = fopen(argv[1], "rb");
  if (!fp) return 2;
  fseek(fp, 0, SEEK_END);
  long len = ftell(fp);
  rewind(fp);
  char *txt = malloc(len + 1);
  if (fread(txt, 1, len, fp) != (size_t)len) return 2;
  fclose(fp);
  while (len && (txt[len - 1] == '\n' || txt[len - 1] == '\r')) len--;
  char *seq = calloc(len / 4 + 2, 1);
  for (long i = 0; i < len; ++i) {
    unsigned char code = 0;
    switch (txt[i]) {
      case 'C': code = 1; break;
      case 'G': code = 2; break;
      case 'T': code = 3; break;
    }
    seq[i >> 2] |= code << (2 * (3 - (i & 3)));
  }
  fm_index *fmi = make_fmi_sacak(seq, (int)len);
  FILE *rf = fopen(argv[2], "r");
  if (!rf) return 2;
  char buf[65536];
  while (fgets(buf, sizeof buf, rf)) {
    int l = strlen(buf);
    while (l && (buf[l - 1] == '\n' || buf[l - 1] == '\r')) buf[--l] = 0;
    if (!l) continue;
    for (int i = 0; i < l; ++i) {
      switch (buf[i]) {
        case 'A': buf[i] = 0; break;
        case 'C': buf[i] = 1; break;
        case 'G': buf[i] = 2; break;
        case 'T': buf[i] = 3; break;
        default: buf[i] = 5;
      }
    }
    rna_seq(fmi, buf, l);
    putchar('\n');
  }
  return 0;
}
