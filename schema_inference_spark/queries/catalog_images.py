SPECS: list = []  # filled in the image-suite milestone (rows-only checks)
