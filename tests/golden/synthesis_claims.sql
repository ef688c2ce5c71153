SELECT CAST(statement AS VARCHAR) AS statement, CAST(sources AS VARCHAR) AS sources, CAST(confidence AS DOUBLE) AS confidence FROM (VALUES
  ('Re ''how to merge fast table join'': batch window spark order data column agg join small line customer query line val', '1', 0.16065573770491806),
  ('Re ''how to merge fast table join'': agg table spark hash sort key vector fast join value data agg query fast window ', '2', 0.16048387096774197),
  ('Re ''how to merge fast table join'': the spark join stream a small order merge column group customer part a spark val', '3', 0.16031746031746033),
  ('Re ''how to merge fast table join'': window query order value query hash agg the small agg fast big window agg agg li', '4', 0.16015625000000003),
  ('Re ''how to merge fast table join'': stream small agg the group stream line group group fast group spark column line ', '5', 0.16000000000000003)
) AS golden(statement, sources, confidence)
