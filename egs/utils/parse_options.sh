# Parse --option value command-line flags into same-named shell variables.
# Kaldi-style option parsing (the reference recipes source the original
# utils/parse_options.sh; this is a fresh minimal equivalent).
#
# Usage: define defaults, then `. utils/parse_options.sh` before using $1...
# Each --some-option VALUE sets ${some_option}=VALUE (dashes -> underscores);
# --help prints the script head.

while true; do
  case "${1:-}" in
    --*)
      name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
      if [ "${name}" = "help" ]; then
        sed -n '2,/^[^#]/p' "$0" | grep '^#' | sed 's/^# \?//'
        exit 0
      fi
      # the variable must have been given a default in the caller
      eval '[ -z "${'"${name}"'+set}" ]' && {
        echo "$0: invalid option $1" >&2
        exit 1
      }
      [ $# -lt 2 ] && { echo "$0: missing value for $1" >&2; exit 1; }
      eval "${name}=\"\$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
true
