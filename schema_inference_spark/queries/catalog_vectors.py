SPECS: list = []  # filled in the similarity milestone
