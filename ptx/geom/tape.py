"""Scene object tree → compiled CSG tape.  (Filled in by ptx.geom.tape.)"""
