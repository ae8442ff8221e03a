/* Test-owned harness main: drives the reference's nw_fast / sw_fast
 * (smw.c) directly so the Python DP can be diffed against it.
 * Usage: nw_main {nw|sw} <str1-digits> <str2-digits>
 * where digits are the 0-3/5 code values, e.g. "01235".
 * Prints the return value (nw) then the CIGAR stack line.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "smw.h"
#include "stack.h"

static int decode(const char *s, char *out) {
  int n = strlen(s);
  for (int i = 0; i < n; ++i) out[i] = s[i] - '0';
  return n;
}

int main(int argc, char **argv) {
  if (argc != 4) return 2;
  char buf1[4096], buf2[4096];
  int l1 = decode(argv[2], buf1);
  int l2 = decode(argv[3], buf2);
  stack *s = stack_make();
  if (!strcmp(argv[1], "nw")) {
    int r = nw_fast(buf1, l1, buf2, l2, s);
    printf("%d\n", r);
  } else {
    sw_fast(buf1, l1, buf2, l2, s);
    printf("-\n");
  }
  stack_print_destroy(s);
  return 0;
}
