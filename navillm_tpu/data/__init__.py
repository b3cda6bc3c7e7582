from .feature_db import (ImageFeaturesDB, SyntheticImageFeaturesDB,
                         create_feature_db, create_object_feature_db)
