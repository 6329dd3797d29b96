SPECS: list = []  # filled in the text/dedup milestone
