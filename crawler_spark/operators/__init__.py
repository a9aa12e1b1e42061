"""Set-oriented dataflow operators. Each module documents the reference
behavior it re-expresses (file:line into /root/reference) and the Spark plan
shape it compiles to."""
