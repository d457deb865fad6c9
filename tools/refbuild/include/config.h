/* autoconf config.h stand-in for the shim build (no feature macros
   are consulted by the reference sources) */
